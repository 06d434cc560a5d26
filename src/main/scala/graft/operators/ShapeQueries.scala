package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Additional relational shapes a user of the reference's data would reach
  * for (SURVEY.md §2.2 breadth): interval-overlap self-join, decorrelated
  * scalar subquery, weekly cohort retention, deterministic per-key mode,
  * and the null-handling scalar family.
  *
  * Money comparisons use the exact-integer-cents discipline (see
  * TpchMoreQueries): cross-multiplied integer sums instead of float
  * averages, so no engine's summation order can flip a comparison.
  */
object ShapeQueries {

  /** Interval-overlap self-join: customers whose 7-day order windows
    * overlap. The join is an EQUI-join on the customer key with the
    * overlap condition as a residual predicate — at 100 TB this shuffles
    * once on o_custkey (or reuses an existing custkey partitioning), never
    * falls back to a nested loop over date ranges; per-key order counts
    * are small, so the within-key pair expansion is bounded. */
  val intervalOverlap = QueryDef(
    "interval_overlap_join",
    (spark, dir) => {
      val w = Tables.orders(spark, dir).select(
        col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("d0"),
        date_add(col("o_orderdate").cast("date"), 7).as("d1"))
      val a = w.select(col("o_custkey"), col("o_orderkey").as("k_a"),
        col("d0").as("a0"), col("d1").as("a1"))
      val b = w.select(col("o_custkey").as("cust_b"),
        col("o_orderkey").as("k_b"), col("d0").as("b0"), col("d1").as("b1"))
      a.join(b, col("o_custkey") === col("cust_b") &&
          col("k_a") < col("k_b") &&
          col("a0") <= col("b1") && col("b0") <= col("a1"))
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_overlaps"),
          sum(datediff(least(col("a1"), col("b1")),
            greatest(col("a0"), col("b0"))) + lit(1))
            .as("sum_overlap_days"))
    },
    Some("""
      WITH w AS (SELECT o_custkey, o_orderkey,
                        CAST(o_orderdate AS DATE) AS d0,
                        CAST(o_orderdate AS DATE) + 7 AS d1
                 FROM orders)
      SELECT a.o_custkey, count(*) AS n_overlaps,
             CAST(sum(date_diff('day', greatest(a.d0, b.d0),
                                least(a.d1, b.d1)) + 1) AS BIGINT)
               AS sum_overlap_days
      FROM w a JOIN w b
        ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
       AND a.d0 <= b.d1 AND b.d0 <= a.d1
      GROUP BY 1
    """))

  /** Correlated scalar subquery ("parts priced above their brand's
    * average"), decorrelated Spark-side into ONE aggregate over part plus
    * a broadcast join back — the scan runs once and nothing is
    * re-aggregated per row. Above-average is decided in exact integer
    * cents: `price_cents * n > sum_cents` ⟺ `price > avg` with no float
    * summation anywhere. */
  val scalarSubqueryAvg = QueryDef(
    "scalar_subquery_avg",
    (spark, dir) => {
      val p = Tables.part(spark, dir)
        .withColumn("cents", expr("CAST(round(p_retailprice * 100) AS BIGINT)"))
      val brand = p.groupBy(col("p_brand"))
        .agg(sum(col("cents")).as("sum_cents"), count(lit(1)).as("n"))
      // broadcast: BOUNDED — one row per p_brand, and TPC-H fixes the
      // brand domain at 25 values ("Brand#MN", M,N ∈ 1..5) at every SF.
      p.join(broadcast(brand), "p_brand")
        .filter(col("cents") * col("n") > col("sum_cents"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_above"),
          max(col("p_retailprice")).as("max_price"))
    },
    Some("""
      SELECT p_brand, count(*) AS n_above, max(p_retailprice) AS max_price
      FROM part p
      WHERE CAST(round(p_retailprice * 100) AS BIGINT) *
              (SELECT count(*) FROM part i WHERE i.p_brand = p.p_brand)
            > (SELECT sum(CAST(round(p_retailprice * 100) AS BIGINT))
               FROM part i WHERE i.p_brand = p.p_brand)
      GROUP BY 1
    """))

  /** Weekly cohort retention over the event stream: cohort = the ISO week
    * of a user's first event; one row per (cohort week, activity week)
    * with distinct active users. Two aggregations over one scan — the
    * user-week dedup is the heavy reduction, everything after moves one
    * row per user-week. */
  val cohortRetention = QueryDef(
    "cohort_retention",
    (spark, dir) => {
      // wk must NOT be cast to DATE on the Spark side: Spark parquet DATE
      // reaches the driver's pandas compare as python date ("2024-01-01")
      // while DuckDB's week-trunc (a DATE) arrives as datetime64
      // ("2024-01-01 00:00:00") — Spark's TIMESTAMP_NTZ is what matches
      // the datetime64 stringification
      val uw = Tables.events(spark, dir)
        .select(col("user_id"),
          date_trunc("week", col("ts")).as("wk"))
        .distinct()
      val cohort = uw.groupBy(col("user_id"))
        .agg(min(col("wk")).as("cohort_wk"))
      uw.join(cohort, "user_id")
        .groupBy(col("cohort_wk"), col("wk"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .withColumn("week_no",
          (datediff(col("wk").cast("date"), col("cohort_wk").cast("date"))
            / lit(7)).cast("long"))
        .select(col("cohort_wk"), col("wk"), col("week_no"), col("n_users"))
    },
    Some("""
      WITH uw AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk
                  FROM events),
      c AS (SELECT user_id, min(wk) AS cohort_wk FROM uw GROUP BY 1)
      SELECT c.cohort_wk, uw.wk,
             date_diff('day', CAST(c.cohort_wk AS DATE), CAST(uw.wk AS DATE))
               // 7 AS week_no,
             count(DISTINCT uw.user_id) AS n_users
      FROM uw JOIN c ON uw.user_id = c.user_id
      GROUP BY 1, 2, 3
    """))

  /** Deterministic per-key mode: each user's most frequent event type,
    * ties broken by event type — mode() builtins leave tie order
    * engine-defined, so both sides state the count-then-name order
    * explicitly. */
  val modePerKey = QueryDef(
    "mode_per_key",
    (spark, dir) =>
      Tables.events(spark, dir)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("rn",
          row_number().over(Window.partitionBy(col("user_id"))
            .orderBy(col("n").desc, col("event_type"))))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type").as("mode_event"), col("n")),
    Some("""
      SELECT user_id, event_type AS mode_event, n FROM (
        SELECT user_id, event_type, n,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY n DESC, event_type) AS rn
        FROM (SELECT user_id, event_type, count(*) AS n
              FROM events GROUP BY 1, 2))
      WHERE rn = 1
    """))

  /** Null-handling scalar family: nullif/coalesce/greatest/least plus the
    * IS NULL predicate, over a synthesized-null column (the testdata
    * itself is null-free — nullif manufactures the nulls the family is
    * about). */
  val nullFuncs = QueryDef(
    "null_funcs",
    (spark, dir) =>
      Tables.lineitem(spark, dir).select(
        col("l_orderkey"), col("l_linenumber"),
        coalesce(nullif(col("l_returnflag"), lit("N")), lit("none"))
          .as("rf_or_none"),
        nullif(col("l_returnflag"), lit("N")).isNull.as("was_n"),
        greatest(col("l_quantity"), col("l_discount") * lit(100))
          .as("g"),
        least(col("l_tax"), col("l_discount")).as("l"),
        coalesce(nullif(col("l_quantity"), lit(1.0)), col("l_tax"))
          .as("qty_or_tax")),
    Some("""
      SELECT l_orderkey, l_linenumber,
             coalesce(nullif(l_returnflag, 'N'), 'none') AS rf_or_none,
             nullif(l_returnflag, 'N') IS NULL AS was_n,
             greatest(l_quantity, l_discount * 100) AS g,
             least(l_tax, l_discount) AS l,
             coalesce(nullif(l_quantity, 1.0), l_tax) AS qty_or_tax
      FROM lineitem
    """))

  val defs: Seq[QueryDef] = Seq(
    intervalOverlap, scalarSubqueryAvg, cohortRetention, modePerKey, nullFuncs)
}
