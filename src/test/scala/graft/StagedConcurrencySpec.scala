package graft

import graft.operators.Staged
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** Concurrent-appender and gc-race hardening for the persisted staging
  * layer (r14 verdict ask #8). The invariant under test: NO published
  * manifest ever references a swept segment — racing builders may lose
  * publishes or fall back to cold rebuilds, but a reader following a
  * manifest must always find its data. The deterministic race window is
  * opened through `Staged.onDeltaBaseSelected` (fires between delta-base
  * selection and publish — exactly where a concurrent gc or appender can
  * interleave). */
class StagedConcurrencySpec extends AnyFunSuite {
  import TestSpark.spark

  private def writeDocs(dir: String, ids: Range, append: Boolean): Unit = {
    import spark.implicits._
    val rows = ids.map { i =>
      (i.toLong, s"alpha bravo charlie delta tok$i tail$i", "en",
        s"src${i % 3}", 40L)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars").repartition(2)
      .write.mode(if (append) "append" else "overwrite")
      .parquet(s"$dir/documents.parquet")
  }

  private def freshDir(): String =
    Files.createTempDirectory("conc_data").toString

  private def modes(stage: String): Seq[String] =
    Staged.buildLogSnapshot.collect { case (s, m) if s == stage => m }

  /** Every manifest under `root` must reference only existing segment
    * dirs — the spec's central invariant. */
  private def assertManifestsLive(root: String): Unit = {
    import scala.jdk.CollectionConverters._
    val s = Files.walk(Paths.get(root))
    val manifests = try {
      s.iterator().asScala
        .filter(p => p.getFileName.toString == "_GRAFT_STAGE").toList
    } finally s.close()
    assert(manifests.nonEmpty, "expected at least one published manifest")
    for (m <- manifests) {
      val segs = Files.readAllLines(m).asScala
        .filter(_.startsWith("segment\t")).map(_.drop(8))
      for (seg <- segs)
        assert(Files.isDirectory(Paths.get(seg)),
          s"manifest $m references swept segment $seg")
    }
  }

  test("two concurrent appenders: racing publishes serialize, gc retains the referenced base (r14 verdict #8)") {
    val root = Files.createTempDirectory("conc_root").toString
    val dir = freshDir()
    writeDocs(dir, 0 until 40, append = false)
    Staged.evict(spark)
    Staged.enablePersist(root)
    def stage(s: org.apache.spark.sql.SparkSession) =
      Staged.appendable(s, dir, "conc@two", "documents", "doc_id")(
        docs => docs.selectExpr("doc_id", "length(text) AS n")) {
        s.read.parquet(s"$dir/documents.parquet")
          .selectExpr("doc_id", "length(text) AS n")
      }
    val s1 = spark.newSession()
    val s2 = spark.newSession()
    try {
      stage(spark).count() // fp1 staged cold
      writeDocs(dir, 40 until 50, append = true)
      Staged.reset(spark)
      // two sessions resolve the grown corpus CONCURRENTLY: both select
      // fp1 as delta base, both publish; the atomic rename serializes —
      // the loser reads the winner's manifest
      val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      val counts = new java.util.concurrent.ConcurrentLinkedQueue[Long]
      val threads = Seq(s1, s2).map { s =>
        new Thread(() =>
          try counts.add(stage(s).count())
          catch { case e: Throwable => errors.add(e); () })
      }
      threads.foreach(_.start())
      threads.foreach(_.join(120000))
      assert(errors.isEmpty, s"concurrent appender failed: ${errors.peek()}")
      import scala.jdk.CollectionConverters._
      assert(counts.asScala.toSeq === Seq(50L, 50L))
      assertManifestsLive(root)
      // the winner's manifest references fp1's segment — gc must retain it
      val deleted = Staged.gc(root, Seq(dir))
      assert(deleted.isEmpty,
        s"gc must retain the delta base a live manifest references: $deleted")
      assertManifestsLive(root)
      // and a third reader still resolves to a plain hit
      Staged.reset(spark)
      Staged.clearBuildLog()
      assert(stage(spark).count() === 50)
      assert(modes("conc@two") === Seq("hit"))
    } finally {
      Staged.onDeltaBaseSelected = () => ()
      Staged.disablePersist()
      Staged.evict(s1)
      Staged.evict(s2)
      Staged.reset(spark)
    }
  }

  test("gc sweep inside the delta window: appendable detects the swept base at the schema probe and rebuilds cold (r14 verdict #8)") {
    val root = Files.createTempDirectory("conc_root_gc").toString
    val dir = freshDir()
    writeDocs(dir, 0 until 30, append = false)
    Staged.evict(spark)
    Staged.enablePersist(root)
    def stage() =
      Staged.appendable(spark, dir, "conc@gc", "documents", "doc_id")(
        docs => docs.selectExpr("doc_id", "length(text) AS n")) {
        spark.read.parquet(s"$dir/documents.parquet")
          .selectExpr("doc_id", "length(text) AS n")
      }
    try {
      stage().count() // fp1 cold
      writeDocs(dir, 30 until 36, append = true)
      Staged.reset(spark)
      Staged.clearBuildLog()
      // the race, made deterministic: right after the builder selects fp1
      // as delta base, a gc sweeps — fp1 is unreferenced at that instant
      // (the new fingerprint has published nothing yet), so it is deleted
      Staged.onDeltaBaseSelected = () => {
        Staged.onDeltaBaseSelected = () => ()
        val swept = Staged.gc(root, Seq(dir))
        assert(swept.nonEmpty, "the race window must actually sweep fp1")
      }
      val grown = stage()
      // the construction-time schema probe (r16 schema-drift net) reads
      // the prior segments and trips on the swept path BEFORE a doomed
      // manifest is published — the delta-swept clause rebuilds cold.
      // (Sweeps landing after the probe but before publish still recover
      // through the post-publish re-check, unchanged.)
      assert(modes("conc@gc") === Seq("delta-swept", "cold"),
        s"swept delta base must cold-rebuild: ${Staged.buildLogSnapshot}")
      assert(grown.count() === 36)
      assertManifestsLive(root)
    } finally {
      Staged.onDeltaBaseSelected = () => ()
      Staged.disablePersist()
      Staged.reset(spark)
    }
  }

  test("gc sweep inside the delta window: rebuildable's prior-table read falls back cold (r14 verdict #8)") {
    val root = Files.createTempDirectory("conc_root_rb").toString
    val dir = freshDir()
    writeDocs(dir, 0 until 30, append = false)
    Staged.evict(spark)
    Staged.enablePersist(root)
    def stage() =
      Staged.rebuildable(spark, dir, "conc@rb", "documents", "doc_id")(
        (prior, delta) =>
          prior.unionByName(delta.selectExpr("doc_id",
            "length(text) AS n"))) {
        spark.read.parquet(s"$dir/documents.parquet")
          .selectExpr("doc_id", "length(text) AS n")
      }
    try {
      stage().count() // fp1 cold
      writeDocs(dir, 30 until 36, append = true)
      Staged.reset(spark)
      Staged.clearBuildLog()
      Staged.onDeltaBaseSelected = () => {
        Staged.onDeltaBaseSelected = () => ()
        val swept = Staged.gc(root, Seq(dir))
        assert(swept.nonEmpty, "the race window must actually sweep fp1")
      }
      val grown = stage()
      // the rebuild READS the swept prior table — the mid-build fallback
      // must catch the failed scan and rebuild cold
      assert(modes("conc@rb") === Seq("delta-swept", "cold"),
        s"swept rebuild base must fall back cold: ${Staged.buildLogSnapshot}")
      assert(grown.count() === 36)
      assertManifestsLive(root)
    } finally {
      Staged.onDeltaBaseSelected = () => ()
      Staged.disablePersist()
      Staged.reset(spark)
    }
  }

  test("format migration vs concurrent publish: a winner landing in the window is honored, never renamed aside (r16 verdict #3 i)") {
    // the race the re-confirm closes: A's move fails on a PRE-MANIFEST-
    // format dir, A reads the manifest (absent) — and between that miss
    // and A's renameAside, racer B renames the old dir aside itself and
    // LANDS a completed publish at the target. Without the re-confirm, A
    // renames B's freshly published table aside, breaking every segment
    // path B's already-returned DataFrame carries. With it, A honors B
    // as the winner: B's manifest stays at the target, B's frame stays
    // readable, and the ONLY .stale-* sibling is the genuine old-format
    // dir B moved.
    val root = Files.createTempDirectory("conc_root_fmt").toString
    val dir = freshDir()
    writeDocs(dir, 0 until 25, append = false)
    Staged.evict(spark)
    Staged.enablePersist(root)
    val sB = spark.newSession()
    def stage(s: org.apache.spark.sql.SparkSession) =
      Staged.appendable(s, dir, "conc@fmt", "documents", "doc_id")(
        docs => docs.selectExpr("doc_id", "length(text) AS n")) {
        s.read.parquet(s"$dir/documents.parquet")
          .selectExpr("doc_id", "length(text) AS n")
      }
    try {
      // plant the stage-kind-changed relic: a manifest-less dir with a
      // sentinel file at the exact publish target
      val target = Staged.stageTargetPath(root, dir, "conc@fmt")
      Files.createDirectories(target)
      Files.writeString(target.resolve("old-format-relic"), "relic")
      var bFrame: Option[org.apache.spark.sql.DataFrame] = None
      val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
      Staged.onFormatMigrationWindow = () =>
        if (fired.compareAndSet(false, true)) {
          // racer B resolves the same stage INSIDE A's window; B's own
          // publish hits the same relic, re-confirms (still absent —
          // the seam only fires once), renames the relic aside, lands
          bFrame = Some(stage(sB))
          assert(bFrame.get.count() === 25L, "B must land a full publish")
        }
      val a = stage(spark)
      assert(a.count() === 25L, "A must read the winner's table")
      // B's manifest is live at the target — A did NOT rename it aside
      assert(Files.exists(target.resolve("_GRAFT_STAGE")),
        "the winner's manifest must survive at the target")
      assert(bFrame.get.count() === 25L,
        "B's already-returned frame must stay readable after A resolves")
      import scala.jdk.CollectionConverters._
      val listing = Files.list(target.getParent)
      val siblings = try listing.iterator().asScala
        .map(_.getFileName.toString).toList finally listing.close()
      val stales = siblings.filter(_.contains(".stale-"))
      assert(stales.size === 1,
        s"exactly one .stale-* (the relic), not the winner: $siblings")
      assert(Files.exists(target.getParent.resolve(stales.head)
          .resolve("old-format-relic")),
        "the renamed-aside dir must be the genuine old-format relic")
      assertManifestsLive(root)
    } finally {
      Staged.onFormatMigrationWindow = () => ()
      Staged.disablePersist()
      Staged.evict(sB)
      Staged.reset(spark)
    }
  }
}
