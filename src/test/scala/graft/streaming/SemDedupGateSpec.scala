package graft.streaming

import java.sql.Timestamp

import graft.TestSpark
import graft.operators.{IvfConfig, SemDedupConfig, SimilarityQueries, Staged}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming semantic gate (r15 verdict ask #7): the embedding-space
  * analogue of the near-dup band gate, pinned against the BATCH
  * `semanticDedupOn` decision on a replayed slice — same frozen cells,
  * same int8 quantization, same exact integer dot, same floor, same
  * min-id dup_of. */
class SemDedupGateSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._
  private implicit def sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // transformWithState requires the RocksDB provider (same fixture as
  // CurationStreamSpec's near-dup tests)
  private def withRocksDb[A](body: => A): A = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try body
    finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  /** Deterministic pseudo-random vector — same family the staging specs
    * use; near-dups are engineered as verbatim copies under new ids. */
  private def vec(i: Int): Array[Float] =
    Array.tabulate(64)(d => (((i * 31 + d * 7) % 13) - 6).toFloat / 6f)

  private val cfg = IvfConfig(centroidEvery = 10, centroidKey = 7,
    frozen = true)

  private def freshCorpus(): String = {
    val dir = java.nio.file.Files.createTempDirectory("semgate").toString
    // 40 base vectors plus re-crawled copies: 50/51/52 copy 5/12/23
    // (distinct cells), 53 copies 5 again (its dup_of must be the
    // SMALLEST match, 5, not 50)
    val rows = (0 until 40).map(i => (i.toLong, vec(i), i % 5)) ++
      Seq((50L, vec(5), 0), (51L, vec(12), 2), (52L, vec(23), 3),
        (53L, vec(5), 0))
    rows.toDF("vec_id", "embedding", "label")
      .repartition(2).write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("streamed semantic verdicts equal the batch semanticDedup decision on a replayed slice") {
    val dir = freshCorpus()
    Staged.reset(spark)
    val batch = SimilarityQueries
      .semanticDedupWith(spark, dir, SemDedupConfig.Default, cfg)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val cents = CurationStream.frozenCentroidLits(spark, dir, cfg)
    withRocksDb {
    val input = MemoryStream[CurationStream.VecIn]
    val q = CurationStream.semDedupGate(input.toDS(), cents)
      .writeStream.outputMode("append").format("memory")
      .queryName("semgate").start()
    try {
      // replay the corpus in id order (the batch min-id rule's order),
      // all within one horizon, across TWO micro-batches
      val all = spark.read.parquet(s"$dir/embeddings.parquet")
        .orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      val (first, second) = all.splitAt(30)
      input.addData(first.zipWithIndex.map { case ((id, e), i) =>
        CurationStream.VecIn(id, e, ts(f"2024-05-01 10:00:${i % 60}%02d"))
      }.toSeq: _*)
      q.processAllAvailable()
      input.addData(second.zipWithIndex.map { case ((id, e), i) =>
        CurationStream.VecIn(id, e, ts(f"2024-05-01 10:01:${i % 60}%02d"))
      }.toSeq: _*)
      q.processAllAvailable()
      val verdicts = spark.table("semgate")
        .as[CurationStream.VecVerdict].collect()
      assert(verdicts.length === all.length,
        "one verdict per in-gate vector")
      val dropped = verdicts.filterNot(_.kept)
        .map(v => v.vecId -> (v.cid, v.dupOf)).toMap
      assert(dropped === batch,
        s"streamed drops must equal the batch decision\n" +
          s"stream: $dropped\nbatch:  $batch")
      // the engineered copies are among the drops (incidental
      // above-floor pairs may add more — parity above is the real pin),
      // and 53's anchor honors the min-id rule: never its later twin 50
      assert(Set(50L, 51L, 52L, 53L).subsetOf(dropped.keySet))
      assert(dropped(53L)._2 < 50L)
      // kept verdicts carry themselves as dupOf
      assert(verdicts.filter(_.kept).forall(v => v.dupOf == v.vecId))
    } finally q.stop()
    }
  }

  test("semantic gate horizon: a paraphrase re-crawl AFTER the horizon re-registers and is kept") {
    val dir = freshCorpus()
    Staged.reset(spark)
    val cents = CurationStream.frozenCentroidLits(spark, dir, cfg)
    withRocksDb {
    val input = MemoryStream[CurationStream.VecIn]
    val q = CurationStream.semDedupGate(input.toDS(), cents,
      horizonMs = 60000L)
      .writeStream.outputMode("append").format("memory")
      .queryName("semgate_hz").start()
    try {
      input.addData(
        CurationStream.VecIn(1L, vec(5), ts("2024-05-01 10:00:00")))
      q.processAllAvailable()
      // in-horizon copy: dropped as 1's semantic dup
      input.addData(
        CurationStream.VecIn(2L, vec(5), ts("2024-05-01 10:00:30")))
      q.processAllAvailable()
      // past the horizon: the crawl moved on — re-admitted, re-registered
      input.addData(
        CurationStream.VecIn(3L, vec(5), ts("2024-05-01 10:02:00")))
      q.processAllAvailable()
      // and a copy within HIS horizon is dropped against him (min id in
      // window, not min id ever)
      input.addData(
        CurationStream.VecIn(4L, vec(5), ts("2024-05-01 10:02:30")))
      q.processAllAvailable()
      val out = spark.table("semgate_hz")
        .as[CurationStream.VecVerdict].collect()
        .map(v => v.vecId -> (v.kept, v.dupOf)).toMap
      assert(out(1L) === ((true, 1L)))
      assert(out(2L) === ((false, 1L)))
      assert(out(3L) === ((true, 3L)))
      assert(out(4L) === ((false, 3L)))
    } finally q.stop()
    }
  }

  test("semantic gate: a mis-dimensioned vector never drops on a prefix dot (r16 self-review)") {
    // batch vec_dot yields NULL on a length mismatch, which can never
    // clear the positive floor — the stream must agree (a truncated
    // prefix dot of an identical first half would wrongly drop)
    val dir = freshCorpus()
    Staged.reset(spark)
    val cents = CurationStream.frozenCentroidLits(spark, dir, cfg)
    withRocksDb {
      val input = MemoryStream[CurationStream.VecIn]
      val q = CurationStream.semDedupGate(input.toDS(), cents)
        .writeStream.outputMode("append").format("memory")
        .queryName("semgate_dim").start()
      try {
        input.addData(
          CurationStream.VecIn(1L, vec(5), ts("2024-05-01 10:00:00")))
        q.processAllAvailable()
        // the corrupt vector: vec(5)'s first 32 dims — its prefix dot
        // against keeper 1 is huge, but the batch rule calls it NO MATCH
        input.addData(
          CurationStream.VecIn(2L, vec(5).take(32),
            ts("2024-05-01 10:00:30")))
        q.processAllAvailable()
        val out = spark.table("semgate_dim")
          .as[CurationStream.VecVerdict].collect()
          .map(v => v.vecId -> v.kept).toMap
        assert(out(2L) === true,
          s"mismatched dims must never match a keeper: $out")
      } finally q.stop()
    }
  }

  test("semantic gate: cell registry survives a checkpointed restart") {
    // a paraphrase re-crawl arriving AFTER a restart must still dot
    // against the keeper registered BEFORE it — RocksDB state restore
    // over the ListState, the near-dup gate's restart discipline
    val dir = freshCorpus()
    Staged.reset(spark)
    val cents = CurationStream.frozenCentroidLits(spark, dir, cfg)
    withRocksDb {
      val ckpt = java.nio.file.Files.createTempDirectory("sg_ckpt").toString
      val outDir = java.nio.file.Files.createTempDirectory("sg_out").toString
      def start(input: MemoryStream[CurationStream.VecIn]) =
        CurationStream.semDedupGate(input.toDS(), cents).writeStream
          .outputMode("append").format("parquet")
          .option("path", outDir).option("checkpointLocation", ckpt).start()
      val batch1 = Seq(
        CurationStream.VecIn(1L, vec(5), ts("2024-05-01 10:00:00")),
        CurationStream.VecIn(2L, vec(12), ts("2024-05-01 10:00:01")))
      val input1 = MemoryStream[CurationStream.VecIn]
      val q1 = start(input1)
      try {
        input1.addData(batch1: _*)
        q1.processAllAvailable()
        assert(spark.read.parquet(outDir).count() === 2)
      } finally q1.stop()
      val input2 = MemoryStream[CurationStream.VecIn]
      input2.addData(batch1: _*) // restart replays the committed batch
      val q2 = start(input2)
      try {
        input2.addData(
          // semantic copy of vec 1, in-horizon: the restored registry
          // must drop it and anchor on the pre-restart keeper
          CurationStream.VecIn(10L, vec(5), ts("2024-05-01 10:20:00")),
          CurationStream.VecIn(11L, vec(30), ts("2024-05-01 10:20:01")))
        q2.processAllAvailable()
        val out = spark.read.parquet(outDir)
          .as[CurationStream.VecVerdict].collect()
          .map(v => v.vecId -> (v.kept, v.dupOf)).toMap
        assert(out(10L) === ((false, 1L)),
          s"restored registry must drop the post-restart copy: $out")
        assert(out(11L)._1 === true)
      } finally q2.stop()
    }
  }
}
