package graft.streaming

import java.sql.Timestamp

import graft.TestSpark
import graft.model.TradeOut
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Event-time streaming operators (SURVEY §2.2 streaming row): watermarked
  * dedup, tumbling OHLCV, sliding VWAP, session windows — exercised through
  * real micro-batches via MemoryStream so watermark advancement and append
  * finalization are tested, not just plan construction. */
class WatermarkedSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._
  private implicit def sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def trade(id: Long, at: String, price: String, vol: String,
      product: String = "ETH-USD"): TradeOut =
    TradeOut("gdax", product, id, id, price, vol, "buy", ts(at),
      backfilled = false, gapStart = -1L, gapEnd = -1L)

  private def runAppend(name: String)(build: Dataset[TradeOut] => DataFrame)(
      batches: Seq[TradeOut]*): Array[Row] = {
    val input = MemoryStream[TradeOut]
    val q = build(input.toDS()).writeStream
      .outputMode("append").format("memory").queryName(name).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table(name).collect()
    } finally q.stop()
  }

  test("dedupTrades drops re-sends of the same (exchange, tradeId) within the watermark") {
    val input = MemoryStream[TradeOut]
    val q = Watermarked.dedupTrades(input.toDS()).writeStream
      .outputMode("append").format("memory").queryName("wm_dedup").start()
    try {
      input.addData(
        trade(1, "2017-10-15 05:10:00", "300.10", "1.0"),
        trade(2, "2017-10-15 05:10:01", "300.11", "0.5"))
      q.processAllAvailable()
      // batch 2: the backfill re-send of id 2 plus a fresh trade
      input.addData(
        trade(2, "2017-10-15 05:10:01", "300.11", "0.5"),
        trade(3, "2017-10-15 05:10:02", "300.12", "0.25"))
      q.processAllAvailable()
      val ids = spark.table("wm_dedup").as[TradeOut].collect()
        .map(_.tradeId).sorted
      assert(ids.toSeq === Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("dedupTrades: ids are per-product — a cross-product id collision survives; id-less rows pass through") {
    val input = MemoryStream[TradeOut]
    val q = Watermarked.dedupTrades(input.toDS()).writeStream
      .outputMode("append").format("memory").queryName("wm_dedup_prod").start()
    try {
      input.addData(
        trade(7, "2017-10-15 05:10:00", "300.10", "1.0", product = "ETH-USD"),
        trade(7, "2017-10-15 05:10:01", "0.05", "9.0", product = "ETH-EUR"),
        // two DISTINCT id-less salvaged trades: must both survive
        trade(-1, "2017-10-15 05:10:02", "1.00", "1.0"),
        trade(-1, "2017-10-15 05:10:03", "2.00", "2.0"))
      q.processAllAvailable()
      val rows = spark.table("wm_dedup_prod").as[TradeOut].collect()
      assert(rows.count(_.tradeId == 7L) === 2,
        "cross-product id collision must not dedup")
      assert(rows.count(_.tradeId == -1L) === 2,
        "id-less sentinel rows must pass through")
    } finally q.stop()
  }

  test("ohlcvStream: the id-less sentinel cannot steal 'open' — ordering is event time first") {
    val rows = runAppend("wm_ohlcv_sentinel")(ds => Watermarked.ohlcvStream(ds,
      width = "1 minute", delay = "0 seconds"))(
      Seq(
        trade(100, "2017-10-15 05:10:05", "300.10", "1.0"),
        // id-less trade LATER in the window: must be close, never open
        trade(-1, "2017-10-15 05:10:50", "299.00", "0.5")),
      Seq(trade(101, "2017-10-15 05:12:00", "301.00", "1.0")))
    assert(rows.length === 1)
    assert(rows.head.getAs[java.math.BigDecimal]("open").doubleValue() === 300.10)
    assert(rows.head.getAs[java.math.BigDecimal]("close").doubleValue() === 299.00)
  }

  test("ohlcvStream: on an event-time TIE (1s resolution) real trades rank ahead of the sentinel") {
    // polo stamps whole seconds, so ties are routine — a salvaged (-1)
    // trade in the same second must not beat a real trade to "open"
    val rows = runAppend("wm_ohlcv_tie")(ds => Watermarked.ohlcvStream(ds,
      width = "1 minute", delay = "0 seconds"))(
      Seq(
        trade(-1, "2017-10-15 05:10:05", "111.11", "0.5"),
        trade(100, "2017-10-15 05:10:05", "300.10", "1.0")),
      Seq(trade(101, "2017-10-15 05:12:00", "301.00", "1.0")))
    assert(rows.length === 1)
    assert(rows.head.getAs[java.math.BigDecimal]("open").doubleValue() === 300.10)
    // on the tie the sentinel deterministically ranks latest → close
    assert(rows.head.getAs[java.math.BigDecimal]("close").doubleValue() === 111.11)
  }

  test("ohlcvStream emits one finalized candle per window with min_by/max_by open/close") {
    val rows = runAppend("wm_ohlcv")(ds => Watermarked.ohlcvStream(ds,
      width = "1 minute", delay = "0 seconds"))(
      Seq(
        trade(1, "2017-10-15 05:10:05", "300.10", "1.0"),
        trade(2, "2017-10-15 05:10:20", "300.50", "2.0"),
        trade(3, "2017-10-15 05:10:40", "299.90", "0.5")),
      // batch 2 advances the watermark past 05:11 → candle finalizes
      Seq(trade(4, "2017-10-15 05:12:00", "301.00", "1.0")))
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getAs[java.math.BigDecimal]("open").doubleValue() === 300.10)
    assert(r.getAs[java.math.BigDecimal]("high").doubleValue() === 300.50)
    assert(r.getAs[java.math.BigDecimal]("low").doubleValue() === 299.90)
    assert(r.getAs[java.math.BigDecimal]("close").doubleValue() === 299.90)
    assert(r.getAs[java.math.BigDecimal]("volume").doubleValue() === 3.5)
    assert(r.getAs[Long]("n_trades") === 3L)
  }

  test("vwapSliding: exact decimal vwap over overlapping windows") {
    val rows = runAppend("wm_vwap")(ds => Watermarked.vwapSliding(ds,
      width = "2 minutes", slide = "1 minute", delay = "0 seconds"))(
      Seq(
        trade(1, "2017-10-15 05:10:10", "100", "1.0"),
        trade(2, "2017-10-15 05:10:20", "200", "3.0")),
      Seq(trade(3, "2017-10-15 05:20:00", "1", "1.0")))
    // trades land in windows [05:09,05:11) and [05:10,05:12): same vwap
    val vwaps = rows.map(_.getAs[java.math.BigDecimal]("vwap").doubleValue())
    assert(vwaps.length === 2)
    vwaps.foreach(v => assert(math.abs(v - 175.0) < 1e-9)) // (100+600)/4
  }

  test("tradeSessions collapses bursts and splits on gaps > gap") {
    val rows = runAppend("wm_sess")(ds => Watermarked.tradeSessions(ds,
      gap = "30 seconds", delay = "0 seconds"))(
      Seq(
        trade(1, "2017-10-15 05:10:00", "300", "1"),
        trade(2, "2017-10-15 05:10:10", "300", "1"),
        // 5 minutes of silence → new session
        trade(3, "2017-10-15 05:15:00", "300", "1")),
      Seq(trade(4, "2017-10-15 05:30:00", "300", "1")))
    val sessions = rows.map(r =>
      (r.getAs[Long]("first_trade_id"), r.getAs[Long]("last_trade_id"),
        r.getAs[Long]("n_trades"))).sortBy(_._1)
    assert(sessions.toSeq === Seq((1L, 2L, 2L), (3L, 3L, 1L)))
  }

  private def poloTrade(id: Long, at: String, price: String,
      product: String = "ETH-USD"): TradeOut =
    TradeOut("polo", product, id, id, price, "1.0", "buy", ts(at),
      backfilled = false, gapStart = -1L, gapEnd = -1L)

  test("crossExchangeMatches: interval join pairs same-product trades across exchanges within the band") {
    val gdax = MemoryStream[TradeOut]
    val polo = MemoryStream[TradeOut]
    val q = Watermarked
      .crossExchangeMatches(gdax.toDS(), polo.toDS(), band = "1 minute",
        delay = "0 seconds")
      .writeStream.outputMode("append").format("memory")
      .queryName("wm_xex").start()
    try {
      // polo trade 30s before the gdax trade → inside the band;
      // polo trade 2min before → outside; different product → never
      gdax.addData(trade(10, "2017-10-15 05:10:00", "300.10", "1.0"))
      polo.addData(
        poloTrade(91, "2017-10-15 05:09:30", "300.05"),
        poloTrade(92, "2017-10-15 05:08:00", "299.00"),
        poloTrade(93, "2017-10-15 05:09:40", "310.00", product = "BTC-USD"))
      q.processAllAvailable()
      // advance both watermarks so buffered state can finalize
      gdax.addData(trade(11, "2017-10-15 05:30:00", "301.00", "1.0"))
      polo.addData(poloTrade(94, "2017-10-15 05:30:00", "301.10"))
      q.processAllAvailable()
      val pairs = spark.table("wm_xex").collect()
        .map(r => (r.getAs[Long]("l_trade_id"), r.getAs[Long]("r_trade_id")))
        .sorted
      assert(pairs.toSeq === Seq((10L, 91L), (11L, 94L)))
    } finally q.stop()
  }

  test("enrichTrades: stream-static broadcast join adds dim columns without stream shuffle") {
    val dim = Seq(
      ("ETH-USD", "ETH", "USD", 0.01),
      ("BTC-USD", "BTC", "USD", 0.01))
      .toDF("productId", "base", "quote", "tick")
    val input = MemoryStream[TradeOut]
    val enriched = Watermarked.enrichTrades(input.toDS(), dim)
    val q = enriched.writeStream
      .outputMode("append").format("memory").queryName("wm_enrich").start()
    try {
      input.addData(
        trade(1, "2017-10-15 05:10:00", "300.10", "1.0"),
        trade(2, "2017-10-15 05:10:01", "300.11", "0.5", product = "XMR-BTC"))
      q.processAllAvailable()
      val rows = spark.table("wm_enrich").collect()
        .map(r => (r.getAs[Long]("tradeId"), r.getAs[String]("base")))
        .sortBy(_._1)
      // known product enriched; unknown product kept (left join), null dim
      assert(rows.toSeq === Seq((1L, "ETH"), (2L, null)))
      assert(spark.table("wm_enrich").columns.toSet
        .intersect(Set("base", "quote", "tick")).size === 3)
    } finally q.stop()
  }
}
