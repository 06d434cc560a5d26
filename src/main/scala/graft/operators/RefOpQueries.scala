package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch analogues of the remaining reference operators (SURVEY.md §2.1
  * ops 8, 13-15, 18-19, 22-23 and the §2.2 set-op category), each a single
  * declarative Spark plan paired with DuckDB oracle SQL.
  *
  * Cross-engine determinism rules used throughout this codebase:
  *  - no raw double *arithmetic* feeds a comparison: money math casts to
  *    DECIMAL first (exact), then the final value casts to DOUBLE (one
  *    IEEE-defined conversion, identical in both engines);
  *  - anything ranked carries a unique-id tiebreak;
  *  - "keep one of the duplicates" is expressed as max/min over the unique
  *    id, never dropDuplicates' arbitrary pick.
  */
object RefOpQueries {

  /** Op 19 (real_guac_async.py:98-107): change-suppressed emission — keep a
    * row only when the watched value differs from the previous one per key
    * (first row always emits, mirroring the reference's empty initial
    * last-state). */
  val changeSuppress = QueryDef(
    "change_suppress",
    (spark, dir) => {
      import spark.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"event_id")
      Tables.events(spark, dir)
        .select($"user_id", $"event_id", $"value")
        .withColumn("prev_value", lag($"value", 1).over(w))
        .filter($"prev_value".isNull || $"value" =!= $"prev_value")
        .select($"user_id", $"event_id", $"value")
    },
    Some("""
      SELECT user_id, event_id, value FROM (
        SELECT user_id, event_id, value,
               lag(value) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_value
        FROM events)
      WHERE prev_value IS NULL OR value <> prev_value
    """))

  /** Op 18 (real_guac_async.py:94-96): top-k per key — top-15 events by
    * value per user (the inside-book top-15 slice as a rank window).
    * Unique event_id tiebreak keeps ranking deterministic across engines. */
  val topkPerKey = QueryDef(
    "topk_per_key",
    (spark, dir) => {
      import spark.implicits._
      val w = Window.partitionBy($"user_id")
        .orderBy($"value".desc, $"event_id".asc)
      Tables.events(spark, dir)
        .select($"user_id", $"event_id", $"value")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 15)
    },
    Some("""
      SELECT user_id, event_id, value, rn FROM (
        SELECT user_id, event_id, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY value DESC, event_id ASC) AS rn
        FROM events)
      WHERE rn <= 15
    """))

  /** Op 13 (real_guac_async.py:111-121): trade normalization — projection /
    * rename / side decode / literal flag / decimal casts. events proxies the
    * match stream (FIXTURES.md §C role mapping). */
  val tradeNormalize = QueryDef(
    "trade_normalize",
    (spark, dir) => {
      import spark.implicits._
      // price normalizes through DECIMAL(18,6) (the engine's canonical
      // price type, SURVEY §1.3) but is compared as DOUBLE: Spark parquet
      // decimals surface as exact java Decimals ("6.550000") while DuckDB
      // decimals become float64 ("6.55") in the driver's pandas compare.
      Tables.events(spark, dir).select(
        $"ts".as("exchange_ts"),
        $"event_id".as("trade_id"),
        concat(lit("P-"), $"user_id").as("product_id"),
        expr("CAST(CAST(value AS DECIMAL(18,6)) AS DOUBLE)").as("price"),
        when($"event_type".isin("purchase", "click", "signup"), lit("buy"))
          .otherwise(lit("sell")).as("side"),
        lit(false).as("backfilled"))
    },
    Some("""
      SELECT ts AS exchange_ts, event_id AS trade_id,
             'P-' || user_id AS product_id,
             CAST(CAST(value AS DECIMAL(18,6)) AS DOUBLE) AS price,
             CASE WHEN event_type IN ('purchase','click','signup')
                  THEN 'buy' ELSE 'sell' END AS side,
             false AS backfilled
      FROM events
    """))

  /** Op 14 (real_guac_async.py:130): product-id rewrite "ETH-USD"→"ETH/USD"
    * for the REST backfill call. */
  val productRewrite = QueryDef(
    "product_rewrite",
    (spark, dir) => {
      import spark.implicits._
      Tables.events(spark, dir)
        .select(concat(lit("P-"), $"user_id").as("product_id"))
        .distinct()
        .withColumn("rest_symbol", expr("replace(product_id, '-', '/')"))
    },
    Some("""
      SELECT DISTINCT 'P-' || user_id AS product_id,
             replace('P-' || user_id, '-', '/') AS rest_symbol
      FROM events
    """))

  /** Op 15 (polo_ws_async.py:124): epoch-seconds → timestamp round-trip
    * (Poloniex trade timestamps arrive as unix epoch). */
  val epochRoundtrip = QueryDef(
    "epoch_roundtrip",
    (spark, dir) => {
      import spark.implicits._
      Tables.events(spark, dir)
        .select($"event_id",
          expr("unix_micros(CAST(ts AS TIMESTAMP)) div 1000000").as("epoch_s"))
        .withColumn("ts_restored",
          expr("CAST(timestamp_seconds(epoch_s) AS TIMESTAMP_NTZ)"))
    },
    Some("""
      SELECT event_id, epoch_s, make_timestamp(epoch_s * 1000000) AS ts_restored
      FROM (SELECT event_id, epoch_us(ts) // 1000000 AS epoch_s FROM events)
    """))

  /** Op 22 (redis_worker.py:57-77): fetched∩missing membership fill =
    * left-semi join (orders that do have lineitems, i.e. fetched ids present
    * in the missing set). */
  val backfillSemi = QueryDef(
    "backfill_semi",
    (spark, dir) => {
      val o = Tables.orders(spark, dir)
      val l = Tables.lineitem(spark, dir).select("l_orderkey")
      o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    },
    Some("""
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      FROM orders o
      WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
    """))

  /** Op 23 (redis_worker.py:79-84): still-missing set difference =
    * left-anti join (ids the fetch did NOT return). */
  val backfillAnti = QueryDef(
    "backfill_anti",
    (spark, dir) => {
      val o = Tables.orders(spark, dir)
      val l = Tables.lineitem(spark, dir).select("l_orderkey")
      o.join(l, o("o_orderkey") === l("l_orderkey"), "left_anti")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    },
    Some("""
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
    """))

  /** Op 22's dict last-wins dedup (redis_worker.py:58-60): one row per
    * (user_id, event_type), the one with the highest event_id — the
    * deterministic formulation of "index by key, last write wins". */
  val dedupLastWins = QueryDef(
    "dedup_last_wins",
    (spark, dir) => {
      import spark.implicits._
      val w = Window.partitionBy($"user_id", $"event_type")
        .orderBy($"event_id".desc)
      Tables.events(spark, dir)
        .select($"user_id", $"event_type", $"event_id", $"value")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .drop("rn")
    },
    Some("""
      SELECT user_id, event_type, event_id, value FROM (
        SELECT user_id, event_type, event_id, value,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY event_id DESC) AS rn
        FROM events)
      WHERE rn = 1
    """))

  /** §2.2 set ops — union distinct of live + backfilled trade ids
    * (the merge the engine performs after a backfill, SURVEY §2.2). */
  val setUnion = QueryDef(
    "set_union",
    (spark, dir) => {
      import spark.implicits._
      val ev = Tables.events(spark, dir)
      ev.filter($"event_type" === "purchase").select($"user_id")
        .union(ev.filter($"value" > 40.0).select($"user_id"))
        .distinct()
    },
    Some("""
      SELECT user_id FROM events WHERE event_type = 'purchase'
      UNION
      SELECT user_id FROM events WHERE value > 40.0
    """))

  /** §2.2 set ops — intersect: users with both purchases and errors. */
  val setIntersect = QueryDef(
    "set_intersect",
    (spark, dir) => {
      import spark.implicits._
      val ev = Tables.events(spark, dir)
      ev.filter($"event_type" === "purchase").select($"user_id")
        .intersect(ev.filter($"event_type" === "error").select($"user_id"))
    },
    Some("""
      SELECT user_id FROM events WHERE event_type = 'purchase'
      INTERSECT
      SELECT user_id FROM events WHERE event_type = 'error'
    """))

  /** §2.2 set ops — except: purchasers who never hit an error (the
    * missing \ fetched loop-control shape, redis_worker.py:79). */
  val setExcept = QueryDef(
    "set_except",
    (spark, dir) => {
      import spark.implicits._
      val ev = Tables.events(spark, dir)
      ev.filter($"event_type" === "purchase")
        .select($"user_id", expr("CAST(date_trunc('DAY', ts) AS TIMESTAMP_NTZ)").as("day"))
        .except(ev.filter($"event_type" === "error")
          .select($"user_id", expr("CAST(date_trunc('DAY', ts) AS TIMESTAMP_NTZ)").as("day")))
    },
    Some("""
      SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day FROM events WHERE event_type = 'purchase'
      EXCEPT
      SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day FROM events WHERE event_type = 'error'
    """))

  /** Op 8 (export_to_csv.py:12-18): full-table export projection (header +
    * all columns; the CSV writing itself is a sink concern). */
  val exportShape = QueryDef(
    "export_shape",
    (spark, dir) => Tables.region(spark, dir).select("r_regionkey", "r_name"),
    Some("SELECT r_regionkey, r_name FROM region"))

  /** Op 4 + §4.2 pushdown showcase: filtered scan with column pruning —
    * only (l_shipdate, l_extendedprice) leave the parquet reader, and the
    * shipdate predicate is pushed to the scan (verified via explain in
    * OpQuerySpec). Exact decimal sum presented as double. */
  val scanFilterPrune = QueryDef(
    "scan_filter_prune",
    (spark, dir) => {
      import spark.implicits._
      Tables.lineitem(spark, dir)
        .filter($"l_shipdate" < lit("1996-01-01").cast("timestamp_ntz"))
        .agg(
          count(lit(1)).as("n_rows"),
          expr("CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)")
            .as("total_price"))
    },
    Some("""
      SELECT count(*) AS n_rows,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      FROM lineitem
      WHERE l_shipdate < TIMESTAMP '1996-01-01'
    """))

  val defs: Seq[QueryDef] = Seq(
    changeSuppress, topkPerKey, tradeNormalize, productRewrite,
    epochRoundtrip, backfillSemi, backfillAnti, dedupLastWins,
    setUnion, setIntersect, setExcept, exportShape, scanFilterPrune)
}
