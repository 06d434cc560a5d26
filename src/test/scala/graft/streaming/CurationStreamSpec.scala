package graft.streaming

import java.sql.Timestamp

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming curation intake: quality gate + watermarked content dedup
  * driven through real micro-batches (MemoryStream), so state eviction and
  * append semantics are what's tested, not plan construction. */
class CurationStreamSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._
  private implicit def sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val goodText = "the quick brown fox jumps over the lazy dog"

  test("quality gate and re-crawl dedup across micro-batches") {
    val input = MemoryStream[DocIn]
    val q = CurationStream.curate(input.toDS()).writeStream
      .outputMode("append").format("memory").queryName("cur_stream").start()
    try {
      input.addData(
        DocIn(1, "crawl0", goodText, ts("2024-05-01 10:00:00")),
        // all-short tokens: nStop (0) is not > nShort — gated out
        DocIn(2, "crawl0", "x y z w v u", ts("2024-05-01 10:00:01")),
        DocIn(3, "crawl1", "the cat sat near the warm mat", ts("2024-05-01 10:00:02")))
      q.processAllAvailable()
      input.addData(
        // re-crawl of doc 1's content: new id, new source, later fetch —
        // content-identical, must be dropped by the hash dedup
        DocIn(10, "crawl1", goodText, ts("2024-05-01 10:05:00")),
        DocIn(11, "crawl1", "the stitch and the time saves nine stitches",
          ts("2024-05-01 10:05:01")))
      q.processAllAvailable()
      val out = spark.table("cur_stream").as[DocCurated].collect()
      assert(out.map(_.docId).sorted.toSeq === Seq(1L, 3L, 11L))
      // stats carried through: doc 1 has 9 tokens, "the" twice
      val d1 = out.find(_.docId == 1L).get
      assert(d1.nTok === 9L && d1.nStop === 2L)
      assert(out.map(_.contentHash).distinct.length === out.length)
    } finally q.stop()
  }

  test("dedup state survives a checkpointed restart") {
    // crawl intake restarts all the time; a re-crawl arriving AFTER the
    // restart must still hit the content hash seen BEFORE it
    // parquet sink: the memory sink refuses checkpoint recovery
    val ckpt = java.nio.file.Files.createTempDirectory("cur_ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("cur_out").toString
    def start(input: MemoryStream[DocIn]) =
      CurationStream.curate(input.toDS()).writeStream
        .outputMode("append").format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt).start()
    val input1 = MemoryStream[DocIn]
    val q1 = start(input1)
    try {
      input1.addData(DocIn(1, "crawl0", goodText, ts("2024-05-01 10:00:00")))
      q1.processAllAvailable()
      assert(spark.read.parquet(outDir).count() === 1)
    } finally q1.stop()
    val input2 = MemoryStream[DocIn]
    // the restarted source must resume at the committed offset: replay the
    // first batch (as a restart would), then the post-restart data
    input2.addData(DocIn(1, "crawl0", goodText, ts("2024-05-01 10:00:00")))
    val q2 = start(input2)
    try {
      input2.addData(
        DocIn(10, "crawl1", goodText, ts("2024-05-01 10:05:00")), // re-crawl
        DocIn(11, "crawl1", "the stitch and the time saves nine stitches",
          ts("2024-05-01 10:05:01")))
      q2.processAllAvailable()
      val ids = spark.read.parquet(outDir).select("docId")
        .as[Long].collect().sorted
      assert(ids.toSeq === Seq(1L, 11L),
        "the pre-restart content hash must still suppress the re-crawl")
    } finally q2.stop()
  }

  test("stream gate agrees with the batch pipeline's explode/agg formulation of the cut") {
    // drift detector: the gate's array-expression cut vs an INDEPENDENT
    // formulation (explode + aggregate, the shape pipeline_clean_corpus
    // uses) sharing the same StopWords literal — if either side's
    // expressions drift, the admitted sets diverge here
    import org.apache.spark.sql.functions._
    val rows = Seq(
      DocIn(1, "s", goodText, ts("2024-05-01 10:00:00")),
      DocIn(2, "s", "x y z w v u", ts("2024-05-01 10:00:01")),
      DocIn(3, "s", "of it is in to go", ts("2024-05-01 10:00:02")),
      DocIn(4, "s", "the shortest admissible one ever", ts("2024-05-01 10:00:03")))
    val viaGate = CurationStream.gate(rows.toDS()).collect()
      .map(_.docId).sorted.toSeq
    val viaBatch = rows.toDS()
      .select($"docId", explode(split($"text", " ")).as("tok"))
      .groupBy($"docId")
      .agg(count(lit(1)).as("nTok"),
        sum(when(col("tok").isin(
          graft.operators.TextQueries.StopWords: _*), 1).otherwise(0))
          .as("nStop"),
        sum(when(length(col("tok")) <= 2, 1).otherwise(0)).as("nShort"))
      .filter($"nTok" >= 3 && $"nStop" > $"nShort")
      .select($"docId").as[Long].collect().sorted.toSeq
    assert(viaGate === viaBatch)
    assert(viaGate === Seq(1L, 4L))
  }

  test("gate stop list is data, not SQL: quote-bearing stop words work") {
    // the old string-spliced `t IN ('the', ...)` expression broke at
    // runtime on a stop word containing a quote; the typed
    // array_contains formulation must treat it as plain data
    val rows = Seq(
      // 3 stop hits ("o'brien's" twice, "the") > 2 short tokens → admitted
      DocIn(1, "s", "o'brien's guide to o'brien's the longform writing",
        ts("2024-05-01 10:00:00")),
      // no stop hits → gated out
      DocIn(2, "s", "completely different words here", ts("2024-05-01 10:00:01")))
    val out = CurationStream.gate(rows.toDS(),
      stopWords = Seq("o'brien's", "the", "a")).collect()
    assert(out.map(_.docId).toSeq === Seq(1L))
    assert(out.head.nStop === 3L)
  }
}
