package graft

import graft.operators.Staged
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

/** Disk-backed staging (r13 verdict ask #1): hit / miss / invalidation
  * semantics of the opt-in persistent stage layer, and value-parity with
  * the default in-session mode. The default mode is untouched — every
  * oracle-checked query runs without `GRAFT_STAGE_DIR` exactly as before. */
class StagedPersistSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("persist mode: miss builds+writes, hit survives reset without rebuilding, corpus change invalidates") {
    val stageRoot = Files.createTempDirectory("stage_root").toString
    val dataDir = Files.createTempDirectory("stage_data")
    Files.write(dataDir.resolve("part-0.parquet"), "x".getBytes)
    Staged.evict(spark)
    Staged.enablePersist(stageRoot)
    try {
      var builds = 0
      def stage() = Staged(spark, dataDir.toString, "persist@spec:a") {
        builds += 1
        spark.range(100).toDF()
      }
      assert(stage().count() === 100)
      assert(builds === 1)
      // reset drops the in-session memo but the DISK table stays warm —
      // the cross-session reuse a persisted staging layer exists for
      Staged.reset(spark)
      val second = stage()
      assert(builds === 1, "hit must read the persisted table, not rebuild")
      assert(second.count() === 100)
      // the memoized frame is a parquet SCAN, so pruning/pushdown reach
      // through the stage boundary (unlike a pinned LogicalRDD)
      assert(second.queryExecution.executedPlan.toString
        .contains("FileScan parquet"),
        second.queryExecution.executedPlan.toString)
      // a different stage key never shares the table
      val other = Staged(spark, dataDir.toString, "persist@spec:b") {
        builds += 1
        spark.range(7).toDF()
      }
      assert(builds === 2 && other.count() === 7)
      // INVALIDATION: touching the corpus moves the fingerprint, so every
      // stage rebuilds under the new subtree. The fingerprint is memoized
      // within a session segment, so the change is picked up at the
      // reset boundary — the same boundary every staged artifact obeys.
      val before = Staged.fingerprint(dataDir.toString)
      Files.setLastModifiedTime(dataDir.resolve("part-0.parquet"),
        FileTime.fromMillis(System.currentTimeMillis() + 5000))
      assert(Staged.fingerprint(dataDir.toString) === before,
        "fingerprint is memoized until the next reset")
      Staged.reset(spark)
      assert(Staged.fingerprint(dataDir.toString) !== before,
        "reset must re-read the corpus fingerprint")
      stage()
      assert(builds === 3, "corpus change must invalidate the stage")
    } finally {
      Staged.disablePersist()
      Staged.reset(spark)
    }
  }

  test("persist mode: real pipeline stages round-trip parquet with results identical to in-session mode") {
    // The near-dup chain (shingles -> bands -> candidates -> verified ->
    // components) and the ANN family (normed -> ivf_cells) cover every
    // stage value type: longs, strings, doubles, double arrays. Any
    // parquet round-trip drift would flip a hash here.
    def collectSorted(name: String): Seq[String] = {
      Staged.reset(spark)
      SparkEntry.queries(name)(spark, sf)
        .collect().map(_.toString).sorted.toSeq
    }
    val queries = Seq("dedup_components", "dedup_canonicalize",
      "ann_topk_ivf", "dedup_simhash_pairs")
    val inSession = queries.map(q => q -> collectSorted(q)).toMap
    val stageRoot = Files.createTempDirectory("stage_root_rt").toString
    Staged.enablePersist(stageRoot)
    try {
      // pass 1: cold — builds and persists every stage
      val cold = queries.map(q => q -> collectSorted(q)).toMap
      // pass 2: warm — every stage read back from parquet
      val warm = queries.map(q => q -> collectSorted(q)).toMap
      for (q <- queries) {
        assert(cold(q) === inSession(q), s"$q drifted in persist mode (cold)")
        assert(warm(q) === inSession(q), s"$q drifted reading persisted stages")
      }
      // and the stages actually landed on disk
      val fp = Staged.fingerprint(sf)
      val stageDirs = Paths.get(stageRoot, fp).toFile.list()
      assert(stageDirs != null && stageDirs.nonEmpty,
        s"no persisted stage tables under $stageRoot/$fp")
    } finally {
      Staged.disablePersist()
      Staged.reset(spark)
    }
  }

  test("persist mode: concurrent builders of one stage publish exactly one table; losers read the winner") {
    val stageRoot = Files.createTempDirectory("stage_root_race").toString
    val dataDir = Files.createTempDirectory("stage_data_race")
    Files.write(dataDir.resolve("part-0.parquet"), "y".getBytes)
    Staged.evict(spark)
    Staged.enablePersist(stageRoot)
    try {
      val builds = new java.util.concurrent.atomic.AtomicInteger(0)
      // N threads race the SAME (dir, stage) cold key: the in-session memo
      // is checked under a lock but builds run outside it, so several
      // builders may run — each writes a temp sibling and exactly one
      // atomic-rename wins; the rest must read the winner, not corrupt it
      val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
      try {
        val results = (1 to 4).map { _ =>
          pool.submit(new java.util.concurrent.Callable[Long] {
            override def call(): Long =
              Staged(spark, dataDir.toString, "race-stage") {
                builds.incrementAndGet()
                spark.range(500).toDF()
              }.count()
          })
        }
        assert(results.map(_.get()).forall(_ === 500L))
      } finally pool.shutdown()
      // exactly one published table, zero surviving temp dirs
      val fp = Staged.fingerprint(dataDir.toString)
      val entries = Paths.get(stageRoot, fp).toFile.list().toSeq
      assert(entries.count(_.startsWith("race-stage")) === 1 &&
        !entries.exists(_.contains(".tmp-")),
        s"publish race left a dirty stage dir: $entries")
      // reread after reset still hits the one table
      Staged.reset(spark)
      val again = Staged(spark, dataDir.toString, "race-stage") {
        builds.incrementAndGet(); spark.range(500).toDF()
      }
      assert(again.count() === 500L)
      assert(builds.get() <= 4, "post-publish read must not rebuild")
    } finally {
      Staged.disablePersist()
      Staged.reset(spark)
    }
  }

  test("persist mode: gc removes stale fingerprint subtrees and orphaned publishes, keeps live ones") {
    val stageRoot = Files.createTempDirectory("stage_root_gc").toString
    val dataDir = Files.createTempDirectory("stage_data_gc")
    Files.write(dataDir.resolve("part-0.parquet"), "z".getBytes)
    Staged.evict(spark)
    Staged.enablePersist(stageRoot)
    try {
      Staged(spark, dataDir.toString, "gc-stage") {
        spark.range(10).toDF()
      }.count()
      val fpOld = Staged.fingerprint(dataDir.toString)
      // corpus regen: old subtree goes stale
      Files.setLastModifiedTime(dataDir.resolve("part-0.parquet"),
        FileTime.fromMillis(System.currentTimeMillis() + 7000))
      Staged.reset(spark)
      Staged(spark, dataDir.toString, "gc-stage") {
        spark.range(10).toDF()
      }.count()
      val fpNew = Staged.fingerprint(dataDir.toString)
      assert(fpOld !== fpNew)
      // plant a crashed publish inside the LIVE subtree
      val orphan = Paths.get(stageRoot, fpNew, "gc-stage-xxxxxx.tmp-dead")
      Files.createDirectories(orphan)
      Files.write(orphan.resolve("junk"), "j".getBytes)
      val deleted = Staged.gc(stageRoot, Seq(dataDir.toString))
      assert(deleted === Seq(fpOld),
        s"gc must delete exactly the stale subtree: $deleted")
      val kept = Paths.get(stageRoot).toFile.list().toSeq
      assert(kept === Seq(fpNew), s"live subtree must survive gc: $kept")
      assert(!Paths.get(stageRoot, fpNew).toFile.list()
        .exists(_.contains(".tmp-")), "orphaned publish must be swept")
      // the live stage still reads
      Staged.reset(spark)
      assert(Staged(spark, dataDir.toString, "gc-stage") {
        spark.range(10).toDF()
      }.count() === 10L)
    } finally {
      Staged.disablePersist()
      Staged.reset(spark)
    }
  }

  test("persist mode: a plain table published without _SUCCESS markers is read, not deleted (r15 ADVICE)") {
    // a deployment running mapreduce.fileoutputcommitter.marksuccessfuljobs
    // =false publishes valid tables with no marker; liveness must key on
    // the parquet part files too, or every resolution deletes and
    // cold-rebuilds a valid table (and the delete can break a concurrent
    // reader mid-scan)
    val stageRoot = Files.createTempDirectory("stage_root_nomark").toString
    val dataDir = Files.createTempDirectory("stage_data_nomark")
    Files.write(dataDir.resolve("part-0.parquet"), "m".getBytes)
    Staged.evict(spark)
    Staged.enablePersist(stageRoot)
    try {
      var builds = 0
      def stage() = Staged(spark, dataDir.toString, "nomark@k") {
        builds += 1
        spark.range(42).toDF()
      }
      assert(stage().count() === 42)
      assert(builds === 1)
      // simulate the marker-suppressing deployment: drop _SUCCESS
      val fp = Staged.fingerprint(dataDir.toString)
      val stDir = Paths.get(stageRoot, fp).toFile.listFiles()
        .find(_.getName.startsWith("nomark_k")).get.toPath
      Files.deleteIfExists(stDir.resolve("_SUCCESS"))
      Staged.reset(spark)
      assert(stage().count() === 42)
      assert(builds === 1,
        "a marker-less dir with parquet parts is a live table — read it")
    } finally {
      Staged.disablePersist()
      Staged.reset(spark)
    }
  }

  test("persist mode: bounded plain-table probe — crashed seg leftovers rebuild, marker-less multi-column layouts still read (r19 ADVICE, r20 review)") {
    val stageRoot = Files.createTempDirectory("stage_root_probe").toString
    val dataDir = Files.createTempDirectory("stage_data_probe")
    Files.write(dataDir.resolve("part-0.parquet"), "p".getBytes)
    Staged.evict(spark)
    Staged.enablePersist(stageRoot)
    try {
      // (a) a CRASHED/foreign manifest-kind state: manifest file gone,
      // a nested seg-*/part file left behind — must NOT classify as a
      // plain table (spark.read over seg-* roots breaks partition
      // discovery); the resolution rebuilds and the publish migrates
      // the leftover aside
      val tgtA = Staged.stageTargetPath(stageRoot, dataDir.toString,
        "probe@a")
      Files.createDirectories(tgtA.resolve("seg-dead"))
      Files.write(tgtA.resolve("seg-dead").resolve("part-0.parquet"),
        "x".getBytes)
      var builds = 0
      def stageA() = Staged(spark, dataDir.toString, "probe@a") {
        builds += 1
        spark.range(42).toDF()
      }
      assert(stageA().count() === 42)
      assert(builds === 1,
        "seg-structured leftovers must fall through to a rebuild")
      // (b) a marker-less MULTI-column partitioned table is still a
      // live plain table: the bounded probe descends col=value children
      // to a fixed depth, not exactly one level (an exactly-one-level
      // probe would cold-rebuild over valid two-column data)
      import spark.implicits._
      val tgtB = Staged.stageTargetPath(stageRoot, dataDir.toString,
        "probe@b")
      val tmp = Files.createTempDirectory("probe_twocol")
      Seq((1, 2, 30L), (4, 5, 60L)).toDF("a", "b", "v")
        .write.partitionBy("a", "b").parquet(tmp.resolve("t").toString)
      Files.deleteIfExists(tmp.resolve("t").resolve("_SUCCESS"))
      Files.createDirectories(tgtB.getParent)
      Files.move(tmp.resolve("t"), tgtB)
      def stageB() = Staged(spark, dataDir.toString, "probe@b") {
        spark.range(7).toDF()
      }
      assert(stageB().count() === 2,
        "a marker-less two-column layout is a live plain table — read it")
    } finally {
      Staged.disablePersist()
      Staged.reset(spark)
    }
  }

  test("persist mode: format migration renames aside (never deletes) and gc sweeps the .stale leftover (r15 ADVICE)") {
    val stageRoot = Files.createTempDirectory("stage_root_aside").toString
    val dataDir = Files.createTempDirectory("stage_data_aside")
    Files.write(dataDir.resolve("part-0.parquet"), "a".getBytes)
    Files.write(dataDir.resolve("docs.parquet"), "d".getBytes)
    // a real documents source for the appendable kind
    val docs = Files.createTempDirectory("stage_docs_aside").toString
    spark.range(5).selectExpr("id AS doc_id")
      .write.mode("overwrite").parquet(s"$docs/documents.parquet")
    Staged.evict(spark)
    Staged.enablePersist(stageRoot)
    try {
      // "old binary": plain-table format
      Staged(spark, docs, "aside@k") {
        spark.read.parquet(s"$docs/documents.parquet")
      }.count()
      Staged.reset(spark)
      // "new binary": same name as a manifest stage → the plain dir
      // blocks the publish and must be renamed ASIDE, not deleted (a
      // delete could race a concurrent valid publish)
      val migrated = Staged.appendable(spark, docs, "aside@k", "documents",
        "doc_id")(d => d)(spark.read.parquet(s"$docs/documents.parquet"))
      assert(migrated.count() === 5)
      val fp = Staged.fingerprint(docs)
      val names = Paths.get(stageRoot, fp).toFile.list().toSeq
      assert(names.exists(_.contains(".stale-")),
        s"the stale-format dir must survive as .stale-*: $names")
      // the catalog never lists leftovers
      assert(!Staged.catalog(stageRoot, Seq(docs))
        .exists(_.stageDir.contains(".stale-")))
      // gc sweeps the leftover inside the live subtree, keeps the stage
      Staged.gc(stageRoot, Seq(docs))
      val after = Paths.get(stageRoot, fp).toFile.list().toSeq
      assert(!after.exists(_.contains(".stale-")), s"gc must sweep: $after")
      Staged.reset(spark)
      assert(Staged.appendable(spark, docs, "aside@k", "documents",
        "doc_id")(d => d)(spark.read.parquet(s"$docs/documents.parquet"))
        .count() === 5)
    } finally {
      Staged.disablePersist()
      Staged.reset(spark)
    }
  }

  test("persist mode: column pruning reaches through the stage boundary") {
    // The quantified payoff of memoizing persisted stages as parquet
    // SCANS: a consumer projecting two narrow columns of the staged
    // normalized-embeddings table (vec_id, norm) must NOT read the
    // 64-double vector column — impossible with the in-session pinned
    // LogicalRDD, where the stage boundary is opaque to Catalyst. At
    // 100 TB this is the difference between scanning the ids of an
    // embedding corpus and scanning the corpus.
    val stageRoot = Files.createTempDirectory("stage_root_prune").toString
    operators.Staged.evict(spark)
    Staged.enablePersist(stageRoot)
    try {
      val slim = operators.SimilarityQueries.normed(spark, sf)
        .select("vec_id", "norm")
      val plan = slim.queryExecution.executedPlan.toString
      assert(plan.contains("FileScan parquet"), plan)
      val readSchema = "ReadSchema: [^\\n]*".r.findFirstIn(plan).getOrElse("")
      assert(readSchema.contains("vec_id") && readSchema.contains("norm") &&
        !readSchema.contains("emb"),
        s"staged scan must prune the vector column: $readSchema")
      Staged.disablePersist()
      Staged.reset(spark)
      // control: the in-session stage cannot prune (pinned blocks carry
      // every column) — this asymmetry is the persist mode's claim
      val sessionPlan = operators.SimilarityQueries.normed(spark, sf)
        .select("vec_id", "norm").queryExecution.executedPlan.toString
      assert(!sessionPlan.contains("FileScan parquet"), sessionPlan)
    } finally {
      Staged.disablePersist()
      Staged.reset(spark)
    }
  }

  test("persist mode: wrapping a staged parquet scan in Materialized is a no-op (no redundant pin)") {
    import graft.functions.Materialized
    val stageRoot = Files.createTempDirectory("stage_root_nopin").toString
    operators.Staged.evict(spark)
    Staged.enablePersist(stageRoot)
    try {
      val staged = Staged(spark, sf, "nopin-stage") {
        Tables.documents(spark, sf).select("doc_id")
      }
      assert(Materialized.isPinned(staged),
        "a persisted stage scan is materialized by definition")
      val before = Materialized.adoptedCount(spark)
      assert(Materialized(staged).df eq staged,
        "the wrap must not localCheckpoint-copy a persisted stage")
      assert(Materialized.adoptedCount(spark) === before)
      // but anything DERIVED from the scan is not bare and still pins
      assert(!Materialized.isPinned(staged.filter("doc_id > 0")))
    } finally {
      Staged.disablePersist()
      Staged.reset(spark)
    }
  }

  test("retention policy: keeps newest stale generations, pins references transitively, never reclaims live (r15 verdict #8)") {
    import org.apache.spark.sql.functions.col
    val stageRoot = Files.createTempDirectory("stage_root_retain").toString
    val docs = Files.createTempDirectory("stage_docs_retain").toString
    def writeDocs(ids: Range, append: Boolean): Unit = {
      import TestSpark.spark.implicits._
      ids.map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
        .repartition(1)
        .write.mode(if (append) "append" else "overwrite")
        .parquet(s"$docs/documents.parquet")
    }
    def resolve(): Unit = {
      Staged.appendable(spark, docs, "ret@k", "documents", "doc_id")(
        d => d.select(col("doc_id")))(
        spark.read.parquet(s"$docs/documents.parquet")
          .select(col("doc_id"))).count()
      ()
    }
    def fp(): String = { Staged.reset(spark); Staged.fingerprint(docs) }
    Staged.evict(spark)
    Staged.enablePersist(stageRoot)
    try {
      // four corpus generations: A (cold) -> B (full rewrite, cold) ->
      // C (append onto B, DELTA manifest referencing B's segments) ->
      // D (full rewrite, live)
      writeDocs(0 until 10, append = false)
      val fpA = fp(); resolve()
      writeDocs(0 until 10, append = false)
      val fpB = fp(); resolve()
      writeDocs(100 until 110, append = true)
      val fpC = fp()
      Staged.clearBuildLog()
      resolve()
      assert(Staged.buildLogSnapshot.contains(("ret@k", "delta")),
        s"C must delta-build on B: ${Staged.buildLogSnapshot}")
      writeDocs(200 until 205, append = false)
      val fpD = fp(); resolve()
      assert(Seq(fpA, fpB, fpC, fpD).distinct.size === 4)
      def dirs(): Set[String] =
        Paths.get(stageRoot).toFile.list().toSet
      // keepStale=1 picks C (newest stale); B is pinned TRANSITIVELY
      // (C's delta manifest references B's segments); only A falls
      val del1 = Staged.retain(stageRoot, Seq(docs),
        Staged.RetentionPolicy(keepStale = 1))
      assert(del1 === Seq(fpA), s"deleted: $del1")
      // B retained solely by C's manifest reference: the rollback
      // target's delta chain stays intact on disk
      assert(dirs() === Set(fpB, fpC, fpD))
      // maxAge=0 expires every stale generation whatever keepStale says;
      // the LIVE fingerprint is untouchable under any policy
      val del2 = Staged.retain(stageRoot, Seq(docs),
        Staged.RetentionPolicy(keepStale = 5, maxAgeMs = 0L),
        nowMs = System.currentTimeMillis() + 60000L)
      assert(del2.toSet === Set(fpB, fpC), s"deleted: $del2")
      assert(dirs() === Set(fpD))
      // the live stage still resolves warm off its intact subtree
      Staged.reset(spark)
      Staged.clearBuildLog()
      resolve()
      assert(Staged.buildLogSnapshot === Seq(("ret@k", "hit")),
        s"live subtree must have survived retention: " +
          s"${Staged.buildLogSnapshot}")
    } finally {
      Staged.disablePersist()
      Staged.reset(spark)
    }
  }

  test("retention ages generations by the publish-time marker, dir mtime only as pre-marker fallback (r17 verdict #3)") {
    import org.apache.spark.sql.functions.col
    val stageRoot = Files.createTempDirectory("stage_root_marker").toString
    val docs = Files.createTempDirectory("stage_docs_marker").toString
    def writeDocs(ids: Range): Unit = {
      import TestSpark.spark.implicits._
      ids.map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
        .repartition(1)
        .write.mode("overwrite").parquet(s"$docs/documents.parquet")
    }
    def resolve(): Unit = {
      Staged(spark, docs, "mark@k") {
        spark.read.parquet(s"$docs/documents.parquet")
          .select(col("doc_id"))
      }.count()
      ()
    }
    def fp(): String = { Staged.reset(spark); Staged.fingerprint(docs) }
    def setMarker(f: String, ts: Long): Unit = {
      Files.write(Paths.get(stageRoot, f, Staged.PublishedMarker),
        ts.toString.getBytes("UTF-8"))
      ()
    }
    def setDirMtime(f: String, ts: Long): Unit = {
      Files.setLastModifiedTime(Paths.get(stageRoot, f),
        FileTime.fromMillis(ts))
      ()
    }
    Staged.evict(spark)
    Staged.enablePersist(stageRoot)
    try {
      // three full-rewrite generations (no delta references): A, B stale,
      // D live. Every publish must have stamped its generation's marker.
      writeDocs(0 until 10); val fpA = fp(); resolve()
      writeDocs(10 until 20); val fpB = fp(); resolve()
      writeDocs(20 until 30); val fpD = fp(); resolve()
      assert(Seq(fpA, fpB, fpD).distinct.size === 3)
      Seq(fpA, fpB, fpD).foreach { f =>
        assert(Files.isRegularFile(
          Paths.get(stageRoot, f, Staged.PublishedMarker)),
          s"publish must stamp $f's ${Staged.PublishedMarker}")
      }
      val now = System.currentTimeMillis()
      // markers say A is the NEWER stale generation; dir mtimes say the
      // opposite — keepStale=1 must follow the markers and reclaim B
      setMarker(fpA, now); setMarker(fpB, now - 3600000L)
      setDirMtime(fpA, now - 3600000L); setDirMtime(fpB, now)
      val del1 = Staged.retain(stageRoot, Seq(docs),
        Staged.RetentionPolicy(keepStale = 1), nowMs = now)
      assert(del1 === Seq(fpB),
        s"the marker, not dir mtime, ranks stale generations: $del1")
      // maxAge reads the marker too: A's marker is `now`, so it survives
      // a tight window that its (hour-old) dir mtime would fail
      val del2 = Staged.retain(stageRoot, Seq(docs),
        Staged.RetentionPolicy(keepStale = 1, maxAgeMs = 60000L),
        nowMs = now)
      assert(del2.isEmpty, s"A's marker is fresh — kept: $del2")
      // pre-marker fallback: strip the markers (a generation published
      // by an older binary) — retention then follows dir mtime
      writeDocs(30 until 40); fp(); resolve() // D goes stale, E live
      Files.delete(Paths.get(stageRoot, fpA, Staged.PublishedMarker))
      Files.delete(Paths.get(stageRoot, fpD, Staged.PublishedMarker))
      setDirMtime(fpA, now); setDirMtime(fpD, now - 3600000L)
      val del3 = Staged.retain(stageRoot, Seq(docs),
        Staged.RetentionPolicy(keepStale = 1), nowMs = now)
      assert(del3 === Seq(fpD),
        s"marker-less generations fall back to dir mtime: $del3")
    } finally {
      Staged.disablePersist()
      Staged.reset(spark)
    }
  }

  test("retainPlan previews exactly what retain then deletes, touching nothing itself (r18)") {
    import org.apache.spark.sql.functions.col
    val stageRoot = Files.createTempDirectory("stage_root_plan").toString
    val docs = Files.createTempDirectory("stage_docs_plan").toString
    def writeDocs(ids: Range): Unit = {
      import TestSpark.spark.implicits._
      ids.map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
        .repartition(1)
        .write.mode("overwrite").parquet(s"$docs/documents.parquet")
    }
    def resolve(): Unit = {
      Staged(spark, docs, "plan@k") {
        spark.read.parquet(s"$docs/documents.parquet")
          .select(col("doc_id"))
      }.count()
      ()
    }
    def fp(): String = { Staged.reset(spark); Staged.fingerprint(docs) }
    def dirs(): Set[String] = Paths.get(stageRoot).toFile.list().toSet
    Staged.evict(spark)
    Staged.enablePersist(stageRoot)
    try {
      writeDocs(0 until 10); val fpA = fp(); resolve()
      writeDocs(10 until 20); val fpB = fp(); resolve()
      writeDocs(20 until 30); fp(); resolve() // live
      val before = dirs()
      val now = System.currentTimeMillis()
      val policy = Staged.RetentionPolicy(keepStale = 1)
      // ensure a deterministic newest-stale pick whatever the publish
      // timing resolution: B is strictly newer than A by marker
      Files.write(Paths.get(stageRoot, fpA, Staged.PublishedMarker),
        (now - 60000L).toString.getBytes("UTF-8"))
      Files.write(Paths.get(stageRoot, fpB, Staged.PublishedMarker),
        now.toString.getBytes("UTF-8"))
      val plan = Staged.retainPlan(stageRoot, Seq(docs), policy,
        nowMs = now)
      assert(plan === Seq(fpA), s"plan: $plan")
      assert(dirs() === before, "the plan must not touch the root")
      val del = Staged.retain(stageRoot, Seq(docs), policy, nowMs = now)
      assert(del === plan,
        s"the sweep must delete exactly the planned set: $del vs $plan")
    } finally {
      Staged.disablePersist()
      Staged.reset(spark)
    }
  }
}
