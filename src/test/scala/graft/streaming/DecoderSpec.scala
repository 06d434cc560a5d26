package graft.streaming

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Decoder tests on the FIXTURES.md §A frame strings (derived from the
  * reference's protocol handling and embedded format notes). */
class DecoderSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def frames(fs: (Long, String)*) =
    fs.toDF("arrival", "value")

  test("gdax snapshot / l2update / match decode to canonical messages") {
    val decoded = Decoders.gdax(frames(
      1L -> """{"type": "snapshot", "product_id": "ETH-USD",
        "bids": [["300.10", "1.5"], ["300.05", "2.0"]],
        "asks": [["300.20", "0.9"]]}""",
      2L -> """{"type": "l2update", "product_id": "ETH-USD",
        "changes": [["buy", "300.10", "2.5"], ["sell", "300.20", "0"]]}""",
      3L -> """{"type": "match", "trade_id": 12345, "sequence": 50,
        "time": "2017-10-15T05:10:53.700000Z", "product_id": "ETH-USD",
        "size": "0.25", "price": "300.15", "side": "buy"}""",
      4L -> """{"type": "subscriptions", "channels": []}"""
    )).collect().sortBy(_.arrival)
    assert(decoded.length === 3) // non-data frame filtered
    val Array(snap, upd, mtch) = decoded
    assert(snap.msgType === "snapshot" && snap.channel === "ETH-USD")
    assert(snap.bids === Seq(Seq("300.10", "1.5"), Seq("300.05", "2.0")))
    assert(upd.changes === Seq(Seq("buy", "300.10", "2.5"),
      Seq("sell", "300.20", "0")))
    assert(mtch.tradeId === 12345L && mtch.sequence === 50L &&
      mtch.price === "300.15" && mtch.side === "buy")
    assert(mtch.exchangeTs.toInstant.toString === "2017-10-15T05:10:53.700Z")
  }

  test("poloniex i/o/t decode; heartbeat skipped; intra-frame order kept") {
    val decoded = Decoders.polo(frames(
      1L -> """[148, 247989292, [["i", {"currencyPair": "BTC_ETH",
        "orderBook": [{"0.03200000": "2.5", "0.03210000": "1.1"},
                      {"0.03190000": "4.0", "0.03180000": "0.8"}]}]]]""",
      2L -> """[148, 247989293, [["o", 1, "0.03195000", "1.20000000"],
                                 ["o", 0, "0.03210000", "0.00000000"]]]""",
      3L -> """[148, 247989294, [["t", "9394200", 1, "5545.00000000",
        "0.00009541", 1508060546]]]""",
      4L -> """[1010]"""
    )).collect().sortBy(_.arrival)
    assert(decoded.length === 4) // heartbeat dropped, 'o' frame → 2 msgs
    val snap = decoded(0)
    assert(snap.msgType === "snapshot" && snap.channel === "148" &&
      snap.productId === "BTC_ETH")
    // orderBook[1] = bids, orderBook[0] = asks
    assert(snap.bids.toSet === Set(Seq("0.03190000", "4.0"),
      Seq("0.03180000", "0.8")))
    assert(snap.asks.toSet === Set(Seq("0.03200000", "2.5"),
      Seq("0.03210000", "1.1")))
    val Seq(o1, o2) = decoded.slice(1, 3).toSeq
    assert(o1.changes === Seq(Seq("buy", "0.03195000", "1.20000000")))
    assert(o2.changes === Seq(Seq("sell", "0.03210000", "0.00000000")))
    assert(o1.arrival < o2.arrival) // intra-frame order preserved
    val t = decoded(3)
    assert(t.msgType === "match" && t.tradeId === 9394200L &&
      t.side === "buy" && t.price === "5545.00000000")
    assert(t.exchangeTs.toInstant.getEpochSecond === 1508060546L)
  }

  test("full pipeline: decode → engine → split, gdax fixture log with gap") {
    val fs = frames(
      1L -> """{"type": "snapshot", "product_id": "ETH-USD",
        "bids": [["300.10", "1.5"]], "asks": [["300.20", "0.9"]]}""",
      2L -> """{"type": "l2update", "product_id": "ETH-USD",
        "changes": [["buy", "300.11", "1.0"]]}""",
      3L -> """{"type": "match", "trade_id": 100, "sequence": 7,
        "time": "2017-10-15T05:10:53.700000Z", "product_id": "ETH-USD",
        "size": "0.25", "price": "300.15", "side": "buy"}""",
      4L -> """{"type": "match", "trade_id": 104, "sequence": 9,
        "time": "2017-10-15T05:10:54.700000Z", "product_id": "ETH-USD",
        "size": "0.30", "price": "300.16", "side": "sell"}""")
    val (books, trades) = BookEngine.split(
      BookEngine.run(Decoders.gdax(fs)))
    assert(books.collect().map(_.bids.head.price).toSet ===
      Set("300.10", "300.11"))
    val ts = trades.collect().sortBy(_.tradeId)
    assert(ts.map(_.tradeId).toSeq === Seq(100L, 104L))
    assert(ts(1).gapStart === 101L && ts(1).gapEnd === 103L)
  }
}
