package graft.streaming

import org.apache.spark.sql.SparkSession

/** Example entry point: replay a small recorded frame log (GDAX + Poloniex
  * shapes from the reference protocol) through decode → stateful engine →
  * console, demonstrating the library's streaming surface end-to-end.
  *
  * Usage: runMain graft.streaming.ReplayDemo [frameLogPath]
  * With no argument, replays a built-in fixture log.
  */
object ReplayDemo {
  val fixtureLog: Seq[(Long, String)] = Seq(
    1L -> """{"type": "snapshot", "product_id": "ETH-USD", "bids": [["300.10", "1.5"], ["300.05", "2.0"]], "asks": [["300.20", "0.9"]]}""",
    2L -> """{"type": "l2update", "product_id": "ETH-USD", "changes": [["buy", "300.12", "2.5"], ["sell", "300.20", "0"]]}""",
    3L -> """{"type": "l2update", "product_id": "ETH-USD", "changes": [["buy", "300.12", "2.5"]]}""",
    4L -> """{"type": "match", "trade_id": 100, "sequence": 7, "time": "2017-10-15T05:10:53.700000Z", "product_id": "ETH-USD", "size": "0.25", "price": "300.15", "side": "buy"}""",
    5L -> """{"type": "match", "trade_id": 104, "sequence": 9, "time": "2017-10-15T05:10:54.700000Z", "product_id": "ETH-USD", "size": "0.30", "price": "300.16", "side": "sell"}""")

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-replay-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val frames =
      if (args.nonEmpty)
        spark.read.textFile(args(0)).rdd.zipWithIndex()
          .map { case (v, i) => (i, v) }.toDF("arrival", "value")
      else fixtureLog.toDF("arrival", "value")

    val (books, trades) = BookEngine.split(
      BookEngine.run(Decoders.gdax(frames)))
    println("=== inside-book updates (change-suppressed) ===")
    books.orderBy("sequence").show(50, truncate = false)
    println("=== trades (with gap flags) ===")
    trades.orderBy("tradeId").show(50, truncate = false)
    spark.stop()
  }
}
