package graft.operators

import graft.{QueryDef, Tables}
import graft.model.MarketMessage
import graft.streaming.BookEngine
import org.apache.spark.sql.functions._

/** Throughput benchmark for the stateful book engine (reference ops 16-20,
  * the heart of the system): synthesizes a deterministic L2/match frame
  * log from the `events` table (one frame per event, keyed per user as a
  * product) and replays it through the SAME flatMapGroupsWithState path
  * the streaming pipeline runs, via Spark's batch fallback. ~600k frames
  * at sf0.1 — the number Bench reports is frames/engine-pass wall-clock,
  * the analogue of the reference's single-node ingest ceiling (SURVEY §6).
  *
  * Not SQL-expressible (order-sensitive keyed state), so no DuckDB oracle:
  * the driver records the weaker rows-only check; value-level coverage for
  * the engine itself lives in OrderBookSpec/StreamingE2ESpec golden tests.
  */
object ReplayBench {

  val bookReplay = QueryDef(
    "book_replay",
    (spark, dir) => {
      import spark.implicits._
      val msgs = Tables.events(spark, dir)
        .select(col("event_id"), col("user_id"),
          expr("CAST(ts AS TIMESTAMP)").as("tsz"))
        .as[(Long, Long, java.sql.Timestamp)]
        .map { case (eid, uid, ts) =>
          val product = s"P-$uid"
          // Deterministic mix: ~1% snapshots (state reset), 20% trades
          // (gap detection — ids stride 5, so every trade reveals a gap),
          // the rest L2 upserts/deletes over a 100-price level universe
          // (size "0" deletes ~1 in 7).
          val price = "%.2f".format((eid * 37 % 10000) / 100.0)
          val size = if (eid % 7 == 0) "0"
            else "%.2f".format((eid * 13 % 900) / 100.0 + 0.01)
          val side = if (eid % 2 == 0) "buy" else "sell"
          if (eid % 97 == 0)
            MarketMessage("bench", product, "snapshot", product, eid, eid,
              Seq(Seq(price, "1.00")), Seq(Seq(price, "1.00")), Nil,
              -1L, "", "", "", ts)
          else if (eid % 5 == 0)
            MarketMessage("bench", product, "match", product, eid, eid,
              Nil, Nil, Nil, eid, price, size, side, ts)
          else
            MarketMessage("bench", product, "l2update", product, eid, eid,
              Nil, Nil, Seq(Seq(side, price, size)), -1L, "", "", "", ts)
        }
      BookEngine.run(msgs)
        .map(e => (
          e.book.map(_.productId).orElse(e.trade.map(_.productId)).getOrElse(""),
          if (e.book.isDefined) 1L else 0L,
          if (e.trade.isDefined) 1L else 0L,
          e.trade.map(t => if (t.gapStart >= 0) 1L else 0L).getOrElse(0L)))
        .toDF("product_id", "is_book", "is_trade", "has_gap")
        .groupBy(col("product_id"))
        .agg(sum(col("is_book")).as("n_book_rows"),
          sum(col("is_trade")).as("n_trades"),
          sum(col("has_gap")).as("n_gapped"))
    },
    None)

  val defs: Seq[QueryDef] = Seq(bookReplay)
}
