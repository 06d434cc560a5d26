package graft.streaming

import graft.TestSpark
import graft.model.EngineOut
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The transformWithState path of the book engine (SURVEY §4.3): same
  * golden semantics as StreamingE2ESpec's flatMapGroupsWithState run —
  * change suppression and gap state must survive micro-batch boundaries
  * through the RocksDB state store. */
class TransformWithStateSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._
  private implicit def sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  test("transformWithState: suppression and gap state survive micro-batches") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(Long, String)]
      val q = BookEngine
        .runTws(Decoders.gdax(input.toDF.toDF("arrival", "value")))
        .writeStream.outputMode("append").format("memory")
        .queryName("tws_out").start()
      try {
        input.addData(
          1L -> """{"type": "snapshot", "product_id": "ETH-USD",
            "bids": [["300.10", "1.5"]], "asks": [["300.20", "0.9"]]}""",
          2L -> """{"type": "match", "trade_id": 100, "sequence": 7,
            "time": "2017-10-15T05:10:53.700000Z", "product_id": "ETH-USD",
            "size": "0.25", "price": "300.15", "side": "buy"}""")
        q.processAllAvailable()
        input.addData(
          3L -> """{"type": "l2update", "product_id": "ETH-USD",
            "changes": [["buy", "300.10", "1.5"]]}""", // no-op vs snapshot
          4L -> """{"type": "match", "trade_id": 103, "sequence": 9,
            "time": "2017-10-15T05:10:54.700000Z", "product_id": "ETH-USD",
            "size": "0.30", "price": "300.16", "side": "sell"}""")
        q.processAllAvailable()

        val out = spark.table("tws_out").as[EngineOut].collect()
        val books = out.flatMap(_.book)
        val trades = out.flatMap(_.trade).sortBy(_.tradeId)
        // snapshot emitted once; the batch-2 no-op delta suppressed via
        // state persisted across the micro-batch boundary
        assert(books.length === 1)
        assert(books.head.bids.map(_.price) === Seq("300.10"))
        // gap 101..102 detected via lastTradeId carried in RocksDB state
        assert(trades.map(_.tradeId).toSeq === Seq(100L, 103L))
        assert(trades(1).gapStart === 101L && trades(1).gapEnd === 102L)
      } finally q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("idle-state TTL evicts a silent product's book; the next snapshot re-emits") {
    // the 100×-product story (r7 verdict ask #9): a delisted product's
    // book must not live in the checkpoint forever. With a TTL, an
    // identical snapshot after the idle window is NOT suppressed — the
    // suppression state (and the book) were evicted.
    //
    // NOTE on the harness: TimeMode.ProcessingTime makes MicroBatchExecution
    // re-trigger continuously to advance timers, so processAllAvailable
    // never returns — the query runs on an explicit short trigger cadence
    // and the test POLLS the sink for each expected emission count.
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(Long, String)]
      val snap = """{"type": "snapshot", "product_id": "ETH-USD",
        "bids": [["300.10", "1.5"]], "asks": [["300.20", "0.9"]]}"""
      def bookCount(): Int = spark.table("tws_ttl_out").as[EngineOut]
        .collect().flatMap(_.book).length
      def awaitBooks(n: Int, timeoutMs: Long = 30000): Unit = {
        val t0 = System.currentTimeMillis()
        while (bookCount() < n) {
          assert(System.currentTimeMillis() - t0 < timeoutMs,
            s"timed out waiting for $n book emissions (got ${bookCount()})")
          Thread.sleep(200)
        }
      }
      val q = BookEngine
        .runTws(Decoders.gdax(input.toDF.toDF("arrival", "value")),
          idleTtl = Some(java.time.Duration.ofSeconds(10)))
        .writeStream.outputMode("append").format("memory")
        .queryName("tws_ttl_out")
        .trigger(org.apache.spark.sql.streaming.Trigger
          .ProcessingTime("300 milliseconds"))
        .start()
      try {
        input.addData(1L -> snap)
        awaitBooks(1)
        // within the TTL: the identical snapshot is suppressed (state live)
        input.addData(2L -> snap)
        Thread.sleep(1500) // > several triggers; emission count must hold
        assert(bookCount() === 1,
          "in-TTL identical snapshot must still be suppressed")
        Thread.sleep(11000) // let the 10 s TTL lapse wall-clock
        input.addData(3L -> snap)
        awaitBooks(2)
        assert(bookCount() === 2,
          "post-TTL snapshot must re-emit: the idle book was evicted")
      } finally q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
