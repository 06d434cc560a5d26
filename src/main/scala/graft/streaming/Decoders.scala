package graft.streaming

import graft.model.MarketMessage
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Frame decoders (reference ops 9-15): raw websocket JSON text →
  * canonical [[MarketMessage]]. Pure `DataFrame → Dataset` column
  * transformations (from_json / get_json_object / explode — all codegen'd
  * built-ins, no UDFs), identical semantics in batch and streaming.
  *
  * Input contract: a frame log with columns `arrival LONG` (source-stamped
  * feed order) and `value STRING` (one JSON text frame).
  */
object Decoders {

  private val emptyPairs = "CAST(array() AS ARRAY<ARRAY<STRING>>)"

  /** GDAX object frames (real_guac_async.py:59-136): `type` tag dispatch;
    * snapshot carries bids/asks pair arrays, l2update carries
    * [side, price, size] changes, match carries the trade fields. */
  def gdax(frames: DataFrame): Dataset[MarketMessage] = {
    import frames.sparkSession.implicits._
    val schema = StructType(Seq(
      StructField("type", StringType),
      StructField("product_id", StringType),
      StructField("sequence", LongType),
      StructField("time", StringType),
      StructField("trade_id", LongType),
      StructField("price", StringType),
      StructField("size", StringType),
      StructField("side", StringType),
      StructField("bids", ArrayType(ArrayType(StringType))),
      StructField("asks", ArrayType(ArrayType(StringType))),
      StructField("changes", ArrayType(ArrayType(StringType)))))
    frames
      .select(col("arrival"), from_json(col("value"), schema).as("m"))
      .filter(col("m.type").isin("snapshot", "l2update", "match"))
      .select(
        lit("gdax").as("exchange"),
        coalesce(col("m.product_id"), lit("")).as("channel"),
        col("m.type").as("msgType"),
        coalesce(col("m.product_id"), lit("")).as("productId"),
        coalesce(col("m.sequence"), lit(-1L)).as("sequence"),
        col("arrival"),
        coalesce(col("m.bids"), expr(emptyPairs)).as("bids"),
        coalesce(col("m.asks"), expr(emptyPairs)).as("asks"),
        coalesce(col("m.changes"), expr(emptyPairs)).as("changes"),
        coalesce(col("m.trade_id"), lit(-1L)).as("tradeId"),
        coalesce(col("m.price"), lit("")).as("price"),
        coalesce(col("m.size"), lit("")).as("size"),
        coalesce(col("m.side"), lit("")).as("side"),
        col("m.time").cast("timestamp").as("exchangeTs"))
      .as[MarketMessage]
  }

  /** Poloniex positional frames (polo_ws_async.py:60-149, format notes
    * polo_ws.py:143-165): envelope `[chanId, seq, [subMsgs…]]`; sub-message
    * tag 'i' = snapshot (orderBook[0]=asks, orderBook[1]=bids as price→size
    * maps; teaches chanId→currencyPair), 'o' = one delta
    * [o, side(1=bid), price, size], 't' = trade
    * [t, tradeId, side(1=buy), price, amount, epochSeconds].
    * Heartbeats/malformed frames lack $[2] → filtered, mirroring the
    * reference's IndexError skip (polo_ws_async.py:148-149). posexplode
    * keeps intra-frame sub-message order (folded into `arrival`). */
  def polo(frames: DataFrame): Dataset[MarketMessage] = {
    import frames.sparkSession.implicits._
    val subs = frames
      .select(col("arrival"),
        get_json_object(col("value"), "$[0]").as("chan"),
        get_json_object(col("value"), "$[1]").cast("long").as("seq"),
        from_json(get_json_object(col("value"), "$[2]"),
          ArrayType(StringType)).as("subs"))
      .filter(col("chan").isNotNull && col("subs").isNotNull)
      // a malformed envelope may carry a non-numeric sequence: the cast
      // NULLs it, and a NULL would kill the non-nullable encoder field
      .withColumn("seq", coalesce(col("seq"), lit(-1L)))
      .select(col("arrival"), col("chan"), col("seq"),
        posexplode(col("subs")).as(Seq("subIdx", "sub")))
      // fold sub-message order into arrival: frames are far apart (one
      // arrival step each), sub-messages fractionally ordered inside it
      .withColumn("arrival",
        col("arrival") * 1000000 + col("subIdx"))
      .withColumn("tag", get_json_object(col("sub"), "$[0]"))
    val snap = subs.filter(col("tag") === "i").select(
      lit("polo").as("exchange"),
      col("chan").as("channel"),
      lit("snapshot").as("msgType"),
      coalesce(get_json_object(col("sub"), "$[1].currencyPair"), lit(""))
        .as("productId"),
      col("seq").as("sequence"),
      col("arrival"),
      // orderBook[1] = bids, orderBook[0] = asks (price→size maps); a
      // garbled 'i' frame yields NULL from the json path — coalesce to
      // empty like every other array column, or installSnapshot NPEs
      expr(s"""coalesce(transform(map_entries(from_json(get_json_object(sub, '$$[1].orderBook[1]'),
               'map<string,string>')), e -> array(e.key, e.value)), $emptyPairs)""").as("bids"),
      expr(s"""coalesce(transform(map_entries(from_json(get_json_object(sub, '$$[1].orderBook[0]'),
               'map<string,string>')), e -> array(e.key, e.value)), $emptyPairs)""").as("asks"),
      expr(emptyPairs).as("changes"),
      lit(-1L).as("tradeId"),
      lit("").as("price"), lit("").as("size"), lit("").as("side"),
      lit(null).cast("timestamp").as("exchangeTs"))
    val delta = subs.filter(col("tag") === "o").select(
      lit("polo").as("exchange"),
      col("chan").as("channel"),
      lit("l2update").as("msgType"),
      lit("").as("productId"),
      col("seq").as("sequence"),
      col("arrival"),
      expr(emptyPairs).as("bids"),
      expr(emptyPairs).as("asks"),
      expr("""array(array(
          CASE WHEN get_json_object(sub, '$[1]') = '1' THEN 'buy' ELSE 'sell' END,
          get_json_object(sub, '$[2]'),
          get_json_object(sub, '$[3]')))""").as("changes"),
      lit(-1L).as("tradeId"),
      lit("").as("price"), lit("").as("size"), lit("").as("side"),
      lit(null).cast("timestamp").as("exchangeTs"))
    val trade = subs.filter(col("tag") === "t").select(
      lit("polo").as("exchange"),
      col("chan").as("channel"),
      lit("match").as("msgType"),
      lit("").as("productId"),
      col("seq").as("sequence"),
      col("arrival"),
      expr(emptyPairs).as("bids"),
      expr(emptyPairs).as("asks"),
      expr(emptyPairs).as("changes"),
      // truncated/garbled trade sub-messages cast to NULL → treat as
      // id-less (-1, excluded from gap tracking) instead of crashing
      coalesce(get_json_object(col("sub"), "$[1]").cast("long"), lit(-1L))
        .as("tradeId"),
      coalesce(get_json_object(col("sub"), "$[3]"), lit("")).as("price"),
      coalesce(get_json_object(col("sub"), "$[4]"), lit("")).as("size"),
      expr("""CASE WHEN get_json_object(sub, '$[2]') = '1'
              THEN 'buy' ELSE 'sell' END""").as("side"),
      expr("CAST(timestamp_seconds(CAST(get_json_object(sub, '$[5]') AS LONG)) AS TIMESTAMP)")
        .as("exchangeTs"))
    snap.unionByName(delta).unionByName(trade).as[MarketMessage]
  }
}
