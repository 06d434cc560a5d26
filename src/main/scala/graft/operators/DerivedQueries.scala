package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Derived analytics over the canonical data (SURVEY.md §2.2): the
  * aggregation / join / window / rollup surface the reference lacks but a
  * consumer of this market data immediately needs (OHLCV, VWAP, as-of
  * book-at-trade-time). All arithmetic that crosses the oracle boundary is
  * exact decimal, presented as double via one final cast (see RefOpQueries
  * scaladoc for the determinism rules).
  *
  * Scale notes: the star joins broadcast the dimension side explicitly;
  * aggregations are partial+final (map-side combine for sum/count/min/max
  * comes free from Catalyst's HashAggregate); every window partitions on a
  * high-cardinality key so no single partition dominates at 100 TB.
  */
object DerivedQueries {

  /** Per-product per-minute OHLCV candles — the canonical consumption of a
    * trade stream (§2.2 aggregation row). open/close via min_by/max_by on
    * the unique event_id (deterministic tiebreak). */
  val ohlcv = QueryDef(
    "ohlcv_1min",
    (spark, dir) => {
      import spark.implicits._
      Tables.events(spark, dir)
        .withColumn("bucket",
          expr("CAST(date_trunc('MINUTE', ts) AS TIMESTAMP_NTZ)"))
        .groupBy($"user_id", $"bucket")
        .agg(
          expr("min_by(value, event_id)").as("open"),
          max($"value").as("high"),
          min($"value").as("low"),
          expr("max_by(value, event_id)").as("close"),
          count(lit(1)).as("n_trades"),
          expr("CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)")
            .as("volume"))
    },
    Some("""
      SELECT user_id, CAST(date_trunc('minute', ts) AS TIMESTAMP) AS bucket,
             arg_min(value, event_id) AS open,
             max(value) AS high, min(value) AS low,
             arg_max(value, event_id) AS close,
             count(*) AS n_trades,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS volume
      FROM events GROUP BY 1, 2
    """))

  /** Volume-weighted average price per part — exact decimal
    * numerator/denominator, one double division at the end (identical
    * operands → identical IEEE result in both engines). */
  val vwap = QueryDef(
    "vwap_by_part",
    (spark, dir) =>
      Tables.lineitem(spark, dir)
        .groupBy("l_partkey")
        .agg(
          expr("""CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                              CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) /
                       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                   AS DOUBLE)""").as("vwap"),
          count(lit(1)).as("n_lines")),
    Some("""
      SELECT l_partkey,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                      CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) /
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS vwap,
             count(*) AS n_lines
      FROM lineitem GROUP BY 1
    """))

  /** As-of join (§2.2 joins row): for each purchase, the latest view
    * at-or-before it per user — the trade↔book-at-trade-time pattern.
    * Spark side: tagged union + last_value(ignoreNulls) running window
    * (shuffle-once, scales by key); oracle side: DuckDB's native ASOF JOIN.
    * Build side deduped per (user_id, ts) by max event_id so the <= tie is
    * deterministic in both formulations. */
  val asofJoin = QueryDef(
    "asof_join",
    (spark, dir) => {
      import spark.implicits._
      val ev = Tables.events(spark, dir)
      val views = ev.filter($"event_type" === "view")
        .groupBy($"user_id", $"ts")
        .agg(expr("max_by(event_id, event_id)").as("view_id"),
          expr("max_by(value, event_id)").as("view_value"))
        .select($"user_id", $"ts", $"view_id", $"view_value",
          lit(0).as("src"), lit(null).cast("long").as("purchase_id"))
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"ts",
          lit(null).cast("long").as("view_id"),
          lit(null).cast("double").as("view_value"),
          lit(1).as("src"), $"event_id".as("purchase_id"))
      val w = Window.partitionBy($"user_id")
        .orderBy($"ts".asc, $"src".asc, $"purchase_id".asc_nulls_first)
        .rowsBetween(Window.unboundedPreceding, 0)
      views.union(purchases)
        .withColumn("asof_view_id", last($"view_id", ignoreNulls = true).over(w))
        .withColumn("asof_view_value",
          last($"view_value", ignoreNulls = true).over(w))
        .filter($"src" === 1)
        .select($"purchase_id", $"user_id", $"ts",
          $"asof_view_id", $"asof_view_value")
    },
    Some("""
      SELECT p.event_id AS purchase_id, p.user_id, p.ts,
             v.view_id AS asof_view_id, v.view_value AS asof_view_value
      FROM (SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'purchase') p
      ASOF LEFT JOIN (
        SELECT user_id, ts, arg_max(event_id, event_id) AS view_id,
               arg_max(value, event_id) AS view_value
        FROM events WHERE event_type = 'view' GROUP BY 1, 2) v
      ON p.user_id = v.user_id AND v.ts <= p.ts
    """))

  /** Star join with broadcast dimensions (§2.2 joins row): revenue per
    * region/nation. nation+region are broadcast (tiny); customer⋈orders
    * shuffles on the key. */
  val starJoin = QueryDef(
    "star_join_revenue",
    (spark, dir) => {
      import spark.implicits._
      val c = Tables.customer(spark, dir)
      // broadcast: BOUNDED — TPC-H fixes nation at 25 and region at 5
      // rows at every scale factor; these never grow with the data.
      val n = broadcast(Tables.nation(spark, dir))
      val r = broadcast(Tables.region(spark, dir))
      val o = Tables.orders(spark, dir)
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy($"r_name", $"n_name")
        .agg(
          expr("CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)")
            .as("revenue"),
          count(lit(1)).as("n_orders"))
    },
    Some("""
      SELECT r_name, n_name,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
             count(*) AS n_orders
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY 1, 2
    """))

  /** TPC-H Q1-shaped pricing summary (§2.2 aggregation row): multi-measure
    * grouped agg incl. avg as exact-sum / count. */
  val q1Pricing = QueryDef(
    "q1_pricing_summary",
    (spark, dir) => {
      import spark.implicits._
      Tables.lineitem(spark, dir)
        .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          expr("CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)")
            .as("sum_qty"),
          expr("CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)")
            .as("sum_base_price"),
          expr("""CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                          (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)""")
            .as("sum_disc_price"),
          expr("""CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) /
                       count(*) AS DOUBLE)""").as("avg_qty"),
          count(lit(1)).as("count_order"))
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                      (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
             count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY 1, 2
    """))

  /** Q3-shaped join + agg + deterministic global top-N (§2.2 sorts/limits
    * row). */
  val q3TopN = QueryDef(
    "q3_topn_revenue",
    (spark, dir) => {
      import spark.implicits._
      val c = Tables.customer(spark, dir)
        .filter($"c_mktsegment" === "BUILDING").select("c_custkey")
      val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
      val l = Tables.lineitem(spark, dir)
      // Reduce orders by the segment filter FIRST (broadcast semi), so the
      // expensive lineitem join sees a 1/|segments|-sized build side that
      // AQE can broadcast; at 100 TB this is the difference between one
      // lineitem-wide shuffle and none.
      // broadcast: SF-GROWING — customer scales with the corpus (TPC-H
      // 150k x SF), so the hint is plan-stats-gated: under 64 MB of scan
      // bytes it broadcasts exactly as before; past that AQE sizes the
      // semi-join (shuffle at 100 TB, where 1/5th of customer is still
      // tens of GB).
      val qualifying = o.join(Broadcasts.broadcastIfSmall(c),
        o("o_custkey") === c("c_custkey"), "left_semi")
        .select("o_orderkey")
      l.join(qualifying, l("l_orderkey") === qualifying("o_orderkey"),
          "left_semi")
        .groupBy($"l_orderkey")
        .agg(expr("""CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                            (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)""")
          .as("revenue"))
        .orderBy($"revenue".desc, $"l_orderkey".asc)
        .limit(10)
    },
    Some("""
      SELECT l_orderkey,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                      (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      WHERE o_custkey IN (SELECT c_custkey FROM customer
                          WHERE c_mktsegment = 'BUILDING')
      GROUP BY 1
      ORDER BY revenue DESC, l_orderkey ASC
      LIMIT 10
    """))

  /** ROLLUP hierarchy totals (§2.2 grouping-sets row). */
  val rollupAgg = QueryDef(
    "rollup_agg",
    (spark, dir) => {
      import spark.implicits._
      val c = Tables.customer(spark, dir)
      // broadcast: BOUNDED — nation is spec-fixed at 25 rows.
      val n = broadcast(Tables.nation(spark, dir))
      c.join(n, c("c_nationkey") === n("n_nationkey"))
        .rollup($"n_name", $"c_mktsegment")
        .agg(count(lit(1)).as("n_customers"),
          expr("CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)")
            .as("total_bal"))
    },
    Some("""
      SELECT n_name, c_mktsegment, count(*) AS n_customers,
             CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY ROLLUP (n_name, c_mktsegment)
    """))

  /** CUBE over two low-cardinality dims (§2.2 grouping-sets row). */
  val cubeAgg = QueryDef(
    "cube_agg",
    (spark, dir) => {
      import spark.implicits._
      Tables.lineitem(spark, dir)
        .cube($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n_lines"))
    },
    Some("""
      SELECT l_returnflag, l_linestatus, count(*) AS n_lines
      FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """))

  /** Window-function battery (§2.2 window row): row_number, running exact
    * sum, lead/lag over a deterministic per-supplier order. */
  val windowRunning = QueryDef(
    "window_running",
    (spark, dir) => {
      import spark.implicits._
      val w = Window.partitionBy($"l_suppkey")
        .orderBy($"l_shipdate".asc, $"l_orderkey".asc, $"l_linenumber".asc)
      Tables.lineitem(spark, dir)
        .select($"l_suppkey", $"l_shipdate", $"l_orderkey", $"l_linenumber",
          $"l_quantity")
        .withColumn("rn", row_number().over(w))
        .withColumn("running_qty",
          expr("CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) OVER (" +
            "PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, " +
            "l_linenumber ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
            "AS DOUBLE)"))
        .withColumn("prev_qty", lag($"l_quantity", 1).over(w))
        .withColumn("next_qty", lead($"l_quantity", 1).over(w))
    },
    Some("""
      SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber, l_quantity,
             row_number() OVER w AS rn,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) OVER (
               PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS running_qty,
             lag(l_quantity) OVER w AS prev_qty,
             lead(l_quantity) OVER w AS next_qty
      FROM lineitem
      WINDOW w AS (PARTITION BY l_suppkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber)
    """))

  /** Deterministic global top-N (§2.2 sorts/limits row). */
  val topnGlobal = QueryDef(
    "topn_global",
    (spark, dir) => {
      import spark.implicits._
      Tables.orders(spark, dir)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
        .limit(100)
    },
    Some("""
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
    """))

  /** Distinct aggregation (§2.2 aggregation row): exact distinct counts
    * per group (expand + two-phase agg in Spark). */
  val aggDistinct = QueryDef(
    "agg_distinct",
    (spark, dir) => {
      import spark.implicits._
      Tables.lineitem(spark, dir)
        .groupBy($"l_returnflag")
        .agg(
          countDistinct($"l_suppkey").as("n_supp"),
          countDistinct($"l_partkey").as("n_part"),
          count(lit(1)).as("n_lines"))
    },
    Some("""
      SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
             count(DISTINCT l_partkey) AS n_part, count(*) AS n_lines
      FROM lineitem GROUP BY 1
    """))

  /** Batch sessionization (§2.2 session-window row, oracle-checkable
    * analogue of streaming session_window): per-user event bursts separated
    * by > 6h of silence. lag marks session starts, a running sum numbers
    * them — two passes over ONE window sort, then a partial+final agg.
    * Partitioned by user_id, so at 100 TB no executor sees more than one
    * user's timeline slice per task. */
  val sessionize = QueryDef(
    "sessionize",
    (spark, dir) => {
      import spark.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
      Tables.events(spark, dir)
        .select($"user_id", $"ts", $"event_id")
        .withColumn("new_sess",
          when(lag($"ts", 1).over(w).isNull ||
            $"ts" > lag($"ts", 1).over(w) + expr("INTERVAL 6 HOUR"), 1L)
            .otherwise(0L))
        .withColumn("sess_no", sum($"new_sess").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy($"user_id", $"sess_no")
        .agg(
          min($"ts").as("session_start"),
          max($"ts").as("session_end"),
          min($"event_id").as("first_event_id"),
          count(lit(1)).as("n_events"))
    },
    Some("""
      WITH marked AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR ts > lag(ts) OVER w + INTERVAL 6 HOUR
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
      numbered AS (
        -- CAST: sum(INTEGER) yields HUGEINT → float64 through pandas,
        -- diverging from Spark's BIGINT in the driver's hash compare.
        SELECT user_id, ts, event_id,
               CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_no
        FROM marked)
      SELECT user_id, sess_no, min(ts) AS session_start,
             max(ts) AS session_end, min(event_id) AS first_event_id,
             count(*) AS n_events
      FROM numbered GROUP BY 1, 2
    """))

  /** Interval (range) join done the 100 TB way (§2.2 joins row): orders
    * against literal price bands. A naive `lo <= v < hi` theta-join plans
    * as a broadcast nested loop — O(rows × bands) comparisons; instead each
    * band is exploded to the fixed-width buckets it covers and the join is
    * an equi-join on the bucket key plus a residual predicate, so it hashes
    * instead of scanning and survives arbitrary band widths. */
  val rangeBandJoin = QueryDef(
    "range_band_join",
    (spark, dir) => {
      import spark.implicits._
      val W = 50000L // bucket width
      val bands = Seq( // (band, lo, hi): [lo, hi) — deliberately uneven
        ("micro", 0L, 75000L),
        ("small", 75000L, 150000L),
        ("mid", 150000L, 300000L),
        ("large", 300000L, 600000L))
      val bandBuckets = bands.flatMap { case (b, lo, hi) =>
        (lo / W) to ((hi - 1) / W) map (k => (b, lo, hi, k))
      }.toDF("band", "lo", "hi", "bucket")
      val o = Tables.orders(spark, dir)
        .select($"o_orderkey", $"o_totalprice",
          (floor($"o_totalprice" / W)).cast("long").as("bucket"))
      // broadcast: BOUNDED — bandBuckets is a literal band list times a
      // fixed bucket width: a few dozen rows independent of the data.
      o.join(broadcast(bandBuckets), Seq("bucket"))
        .filter($"o_totalprice" >= $"lo" && $"o_totalprice" < $"hi")
        .groupBy($"band")
        .agg(count(lit(1)).as("n_orders"),
          expr("CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)")
            .as("turnover"))
    },
    Some("""
      WITH bands(band, lo, hi) AS (VALUES
        ('micro', 0, 75000), ('small', 75000, 150000),
        ('mid', 150000, 300000), ('large', 300000, 600000))
      SELECT band, count(*) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS turnover
      FROM orders JOIN bands
        ON o_totalprice >= lo AND o_totalprice < hi
      GROUP BY 1
    """))

  /** Salted skew join (§7.1 step 8): lineitem⋈supplier through
    * plans.SkewJoin — each hot l_suppkey spread over 8 shuffle partitions,
    * dim side replicated 8×. The oracle is the PLAIN join: salting must be
    * result-invariant, and the hash-match proves it. */
  val skewSaltedJoin = QueryDef(
    "skew_salted_join",
    (spark, dir) => {
      import spark.implicits._
      val fact = Tables.lineitem(spark, dir)
        .select($"l_suppkey".as("suppkey"), $"l_quantity")
      val dim = Tables.supplier(spark, dir)
        .select($"s_suppkey".as("suppkey"), $"s_nationkey")
      graft.plans.SkewJoin.salted(fact, dim, "suppkey", salts = 8)
        .groupBy($"s_nationkey")
        .agg(count(lit(1)).as("n_lines"),
          expr("CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)")
            .as("total_qty"))
    },
    Some("""
      SELECT s_nationkey, count(*) AS n_lines,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               AS total_qty
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY 1
    """))

  /** Discrete quantiles per group (§2.2 aggregation row): p50/p90/p99 of
    * order totals per order-priority, selected by explicit rank math
    * (rn == ceil(q·n), ordered by value with key tiebreak) — discrete
    * selection picks an actual row, so both engines agree exactly; no
    * interpolation arithmetic crosses the oracle boundary. One window sort
    * + one agg; at scale this is the shuffle-cheap exact-quantile form
    * (approx_percentile is the sketch alternative when one pass matters). */
  val quantiles = QueryDef(
    "quantiles_disc",
    (spark, dir) => {
      import spark.implicits._
      val w = Window.partitionBy($"o_orderpriority")
        .orderBy($"o_totalprice".asc, $"o_orderkey".asc)
      Tables.orders(spark, dir)
        .select($"o_orderpriority", $"o_totalprice", $"o_orderkey")
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy($"o_orderpriority")))
        .filter($"rn" === ceil($"n" * 0.5) || $"rn" === ceil($"n" * 0.9) ||
          $"rn" === ceil($"n" * 0.99))
        .groupBy($"o_orderpriority")
        .agg(
          max(when($"rn" === ceil($"n" * 0.5), $"o_totalprice")).as("p50"),
          max(when($"rn" === ceil($"n" * 0.9), $"o_totalprice")).as("p90"),
          max(when($"rn" === ceil($"n" * 0.99), $"o_totalprice")).as("p99"))
    },
    Some("""
      WITH ranked AS (
        SELECT o_orderpriority, o_totalprice,
               row_number() OVER (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn,
               count(*) OVER (PARTITION BY o_orderpriority) AS n
        FROM orders)
      SELECT o_orderpriority,
             max(CASE WHEN rn = ceil(n * 0.5) THEN o_totalprice END) AS p50,
             max(CASE WHEN rn = ceil(n * 0.9) THEN o_totalprice END) AS p90,
             max(CASE WHEN rn = ceil(n * 0.99) THEN o_totalprice END) AS p99
      FROM ranked
      WHERE rn = ceil(n * 0.5) OR rn = ceil(n * 0.9) OR rn = ceil(n * 0.99)
      GROUP BY 1
    """))

  val defs: Seq[QueryDef] = Seq(
    ohlcv, vwap, asofJoin, starJoin, q1Pricing, q3TopN,
    rollupAgg, cubeAgg, windowRunning, topnGlobal, aggDistinct,
    sessionize, rangeBandJoin, skewSaltedJoin, quantiles)
}
