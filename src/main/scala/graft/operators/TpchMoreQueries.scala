package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Second wave of classic TPC-H join/aggregation shapes (adapted to the
  * driver's trimmed schemas): scan-tight filter aggregation (Q6),
  * bidirectional two-nation volume (Q7), returned-item customer ranking
  * with top-N (Q10), conditional promo ratio (Q14), disjunctive
  * multi-band predicates (Q19), and anti-join + scalar-aggregate
  * threshold (Q22).
  *
  * Money discipline matches q5 (AnalyticsQueries): exact integer cents
  * (`round(x*100)` as BIGINT) summed in BIGINT, ONE double division at the
  * end — plain double sums are order-sensitive in the last ulp and diverge
  * between engines. Threshold comparisons cross-multiply in integers
  * instead of comparing against a double quotient.
  */
object TpchMoreQueries {

  private val rev4 =
    "CAST(round(l_extendedprice * 100) AS BIGINT)" +
      " * (100 - CAST(round(l_discount * 100) AS BIGINT))"

  /** Q6: forecast revenue change — tight scan-only aggregation whose three
    * range predicates all push to the parquet scan; revenue here is
    * price × discount (the discounted slice), in exact cents⁴. */
  val q6 = QueryDef(
    "q6_forecast_revenue",
    (spark, dir) =>
      Tables.lineitem(spark, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1997-01-01") &&
          col("l_discount").between(0.02, 0.09) &&
          col("l_quantity") < 24)
        .agg(
          sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)" +
            " * CAST(round(l_discount * 100) AS BIGINT)")).as("rev4"),
          count(lit(1)).as("n_items"))
        .select((col("rev4").cast("double") / lit(10000.0)).as("revenue"),
          col("n_items")),
    Some("""
      SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                      * CAST(round(l_discount * 100) AS BIGINT))
                  AS DOUBLE) / 10000.0 AS revenue,
             count(*) AS n_items
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_discount BETWEEN 0.02 AND 0.09
        AND l_quantity < 24
    """))

  /** Q7: volume shipped between two nations, both directions, by year —
    * the double-dimension join (supplier nation × customer nation) with a
    * symmetric pair filter; dims broadcast, the fact side shuffles once
    * for the final group. */
  val q7 = QueryDef(
    "q7_nation_volume",
    (spark, dir) => {
      // broadcast: BOUNDED — nation is spec-fixed at 25 rows (both roles).
      val n1 = broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
      val n2 = broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation")))
      Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
        // broadcast: SF-GROWING — supplier scales 10k x SF; plan-stats
        // gated (identical plan under 64 MB, AQE-sized past it).
        .join(Broadcasts.broadcastIfSmall(Tables.supplier(spark, dir)),
          col("l_suppkey") === col("s_suppkey"))
        .join(n1, col("s_nationkey") === col("s_nk"))
        .join(n2, col("c_nationkey") === col("c_nk"))
        .filter((col("supp_nation") === "NATION_1" &&
          col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" &&
            col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(sum(expr(rev4)).as("rev4"), count(lit(1)).as("n_items"))
        .select(col("supp_nation"), col("cust_nation"), col("l_year"),
          (col("rev4").cast("double") / lit(10000.0)).as("volume"),
          col("n_items"))
    },
    Some("""
      SELECT supp_nation, cust_nation, l_year,
             CAST(sum(rev4) AS DOUBLE) / 10000.0 AS volume,
             count(*) AS n_items
      FROM (
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               CAST(year(l_shipdate) AS BIGINT) AS l_year,
               CAST(round(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev4
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
           OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
      GROUP BY 1, 2, 3
    """))

  /** Q10: top-20 customers by revenue lost to returned items in one
    * quarter — fact filter, three joins, group per customer, global top-N
    * ordered on the EXACT integer revenue (a double sort key could flip
    * near-ties between engines) with custkey tiebreak. */
  val q10 = QueryDef(
    "q10_returned_revenue",
    (spark, dir) =>
      Tables.lineitem(spark, dir)
        .filter(col("l_returnflag") === "R")
        .join(Tables.orders(spark, dir)
          .filter(col("o_orderdate") >= lit("1996-01-01") &&
            col("o_orderdate") < lit("1996-07-01")),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
        // broadcast: BOUNDED — nation is spec-fixed at 25 rows.
        .join(broadcast(Tables.nation(spark, dir)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(sum(expr(rev4)).as("rev4"))
        .orderBy(col("rev4").desc, col("c_custkey").asc)
        .limit(20)
        .select(col("c_custkey"), col("c_name"), col("n_name"),
          (col("rev4").cast("double") / lit(10000.0)).as("revenue")),
    Some("""
      SELECT c_custkey, c_name, n_name,
             CAST(rev4 AS DOUBLE) / 10000.0 AS revenue
      FROM (
        SELECT c_custkey, c_name, n_name,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS rev4
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-07-01'
        GROUP BY 1, 2, 3)
      ORDER BY rev4 DESC, c_custkey ASC
      LIMIT 20
    """))

  /** Q14: promo revenue share — conditional aggregation over a part join;
    * the ratio is one double expression over two exact BIGINT sums, with
    * identical shape on both engines. */
  val q14 = QueryDef(
    "q14_promo_ratio",
    (spark, dir) =>
      Tables.lineitem(spark, dir)
        .filter(col("l_shipdate") >= lit("1996-03-01") &&
          col("l_shipdate") < lit("1996-04-01"))
        // broadcast: SF-GROWING — part scales 200k x SF; plan-stats gated.
        .join(Broadcasts.broadcastIfSmall(Tables.part(spark, dir)),
          col("l_partkey") === col("p_partkey"))
        .agg(
          sum(expr(s"CASE WHEN p_type = 'PROMO' THEN $rev4 ELSE 0 END"))
            .as("promo4"),
          sum(expr(rev4)).as("total4"))
        .select(
          (col("promo4").cast("double") * lit(100.0) /
            col("total4").cast("double")).as("promo_pct"),
          col("promo4"), col("total4")),
    Some("""
      SELECT CAST(promo4 AS DOUBLE) * 100.0 / CAST(total4 AS DOUBLE)
               AS promo_pct,
             promo4, total4
      FROM (
        SELECT CAST(sum(CASE WHEN p_type = 'PROMO'
                        THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                             * (100 - CAST(round(l_discount * 100) AS BIGINT))
                        ELSE 0 END) AS BIGINT) AS promo4,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                 AS BIGINT) AS total4
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-03-01'
          AND l_shipdate < TIMESTAMP '1996-04-01')
    """))

  /** Q19: disjunctive multi-band predicate (brand × size × quantity OR
    * chains) over a part join — the optimizer must keep the equi-join key
    * while evaluating the OR-of-ANDs as a residual, not fall back to a
    * nested loop. */
  val q19 = QueryDef(
    "q19_disjunctive",
    (spark, dir) =>
      Tables.lineitem(spark, dir)
        // broadcast: SF-GROWING — part scales 200k x SF; plan-stats gated.
        .join(Broadcasts.broadcastIfSmall(Tables.part(spark, dir)),
          col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 5) &&
            col("l_quantity").between(20, 30)))
        .agg(sum(expr(rev4)).as("rev4"), count(lit(1)).as("n_items"))
        .select((col("rev4").cast("double") / lit(10000.0)).as("revenue"),
          col("n_items")),
    Some("""
      SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                  AS DOUBLE) / 10000.0 AS revenue,
             count(*) AS n_items
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
             AND l_quantity BETWEEN 1 AND 11)
         OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
             AND l_quantity BETWEEN 10 AND 20)
         OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 5
             AND l_quantity BETWEEN 20 AND 30)
    """))

  /** Q22: idle wealthy customers — scalar aggregate threshold + anti
    * join against the customers with RECENT orders (every customer has
    * SOME order in this corpus, so the classic any-order anti join would
    * be vacuous). The above-average test cross-multiplies in integer
    * cents (acctbal_cents × n > total_cents) instead of comparing to a
    * double quotient, so the threshold decision is exact in both
    * engines. */
  val q22 = QueryDef(
    "q22_idle_customers",
    (spark, dir) => {
      val cust = Tables.customer(spark, dir)
        .withColumn("bal_c", expr("CAST(round(c_acctbal * 100) AS BIGINT)"))
      // broadcast: BOUNDED — a global aggregate is exactly one row.
      val thresh = broadcast(cust.filter(col("c_acctbal") > 0.0)
        .agg(sum(col("bal_c")).as("total_c"), count(lit(1)).as("n_pos")))
      cust.crossJoin(thresh)
        .filter(col("bal_c") * col("n_pos") > col("total_c"))
        .join(Tables.orders(spark, dir)
          .filter(col("o_orderdate") >= lit("1999-01-01"))
          .select(col("o_custkey").as("c_custkey")).distinct(),
          Seq("c_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"), sum(col("bal_c")).as("bal_sum_c"))
        .select(col("c_mktsegment"), col("n_cust"),
          (col("bal_sum_c").cast("double") / lit(100.0)).as("total_acctbal"))
    },
    Some("""
      WITH c AS (SELECT c_custkey, c_mktsegment,
                        CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c,
                        c_acctbal
                 FROM customer),
      t AS (SELECT sum(bal_c) AS total_c, CAST(count(*) AS BIGINT) AS n_pos
            FROM c WHERE c_acctbal > 0.0)
      SELECT c_mktsegment, count(*) AS n_cust,
             CAST(sum(bal_c) AS DOUBLE) / 100.0 AS total_acctbal
      FROM c, t
      WHERE bal_c * n_pos > total_c
        AND NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '1999-01-01')
      GROUP BY 1
    """))

  /** Pure-inequality band join where a broadcast nested-loop IS the right
    * plan: the band table is 3 rows, so NLJ costs 3 comparisons per
    * lineitem row with zero shuffle — the deliberate counterpart to
    * `range_band_join`, which explodes bands to fixed-width buckets
    * precisely because ITS band table scales with the data. Together they
    * pin the engine's rule: tiny side → broadcast NLJ; growing side →
    * bucketed equi-join. Band edges sit at .5 so the DOUBLE quantity can
    * never hit a boundary. */
  val quantityBandNlj = QueryDef(
    "quantity_band_nlj",
    (spark, dir) => {
      import spark.implicits._
      val bands = Seq(
        ("low", 0.5, 17.5), ("mid", 17.5, 34.5), ("high", 34.5, 1.0e9))
        .toDF("band", "lo", "hi")
      Tables.lineitem(spark, dir)
        // broadcast: BOUNDED — bands is a 3-row literal.
        .join(broadcast(bands),
          col("l_quantity") > col("lo") && col("l_quantity") <= col("hi"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n_items"), sum(expr(rev4)).as("rev4"))
        .select(col("band"), col("n_items"),
          (col("rev4").cast("double") / lit(10000.0)).as("revenue"))
    },
    Some("""
      SELECT band, count(*) AS n_items,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                  AS DOUBLE) / 10000.0 AS revenue
      FROM lineitem
      JOIN (VALUES ('low', 0.5, 17.5), ('mid', 17.5, 34.5),
                   ('high', 34.5, 1000000000.0)) b(band, lo, hi)
        ON l_quantity > lo AND l_quantity <= hi
      GROUP BY 1
    """))

  val defs: Seq[QueryDef] = Seq(q6, q7, q10, q14, q19, q22, quantityBandNlj)
}
