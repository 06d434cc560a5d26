package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Third (final) wave of TPC-H join/aggregation shapes, completing the
  * suite's coverage on the driver's trimmed schema. The driver testdata
  * carries no partsupp table and no l_commitdate/l_receiptdate/l_shipmode
  * columns, so the affected queries are ANALOGUES that keep the plan shape
  * while substituting observable columns:
  *   - "late" (Q4/Q12/Q21's commit-vs-receipt test) := l_shipdate more
  *     than 60 days after o_orderdate;
  *   - supply cost (Q9) := half the part's retail price, exact in integer
  *     cents (`round(p_retailprice*100) * 50` is rev4-scaled);
  *   - part-supplier relationships (Q2/Q11/Q16/Q20) := the DISTINCT
  *     (l_partkey, l_suppkey) pairs observed in lineitem.
  *
  * Money discipline matches the rest of the suite: exact integer cents
  * summed in BIGINT, ONE double division at the end; threshold and min
  * comparisons happen on integers (cross-multiplied or integer-divided),
  * never on double quotients.
  */
object TpchFinalQueries {

  private val rev4 =
    "CAST(round(l_extendedprice * 100) AS BIGINT)" +
      " * (100 - CAST(round(l_discount * 100) AS BIGINT))"

  private val late = "INTERVAL 60 DAYS"

  /** Q4: order-priority checking — EXISTS-driven left-semi join from a
    * date-bounded orders slice to its late lineitems, then a tiny
    * aggregation by priority. The semi join keeps orders multiplicity-1
    * (no distinct needed) and at scale shuffles only orderkeys. */
  val q4 = QueryDef(
    "q4_priority_late",
    (spark, dir) =>
      Tables.orders(spark, dir)
        .filter(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1996-04-01"))
        .join(Tables.lineitem(spark, dir)
          .select(col("l_orderkey"), col("l_shipdate")),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr(late),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders")),
    Some("""
      SELECT o_orderpriority, count(*) AS n_orders
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1996-04-01'
        AND EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey
                      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      GROUP BY 1
    """))

  /** Q8: national market share — one nation's slice of a region's PROMO
    * revenue per year. Both sums stay exact BIGINT through the group-by;
    * the share is one double division. Dims (part slice, supplier,
    * nations, region) broadcast; customer membership is a semi join
    * (multiplicity-safe: each order has one customer). */
  val q8 = QueryDef(
    "q8_market_share",
    (spark, dir) => {
      val custInRegion = Tables.customer(spark, dir)
        // broadcast: BOUNDED — nation ⋈ region slice is ≤ 25 rows (both
        // dims spec-fixed).
        .join(broadcast(Tables.nation(spark, dir)
          .join(broadcast(Tables.region(spark, dir)
            .filter(col("r_name") === "AMERICA")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"))
      // broadcast: SF-GROWING — ≤ one row per supplier (nation only
      // decorates), so the hint is gated on supplier's scan stats.
      val supp = Tables.supplier(spark, dir)
      val suppNation = Broadcasts.broadcastSizedBy(supp
        .join(broadcast(Tables.nation(spark, dir)
          .select(col("n_nationkey"), col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("supp_nation")), supp)
      Tables.lineitem(spark, dir)
        // broadcast: SF-GROWING — part slice scales with SF; plan-stats
        // gated (charged full part scan bytes, the honest growth bound).
        .join(Broadcasts.broadcastIfSmall(Tables.part(spark, dir)
          .filter(col("p_type") === "PROMO").select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .join(custInRegion, col("o_custkey") === col("c_custkey"), "left_semi")
        .join(suppNation, col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          sum(expr(s"CASE WHEN supp_nation = 'NATION_3' THEN $rev4 ELSE 0 END"))
            .as("nat4"),
          sum(expr(rev4)).as("tot4"))
        .select(col("o_year"),
          (col("nat4").cast("double") / col("tot4").cast("double"))
            .as("mkt_share"),
          col("nat4"), col("tot4"))
    },
    Some("""
      SELECT o_year, CAST(nat4 AS DOUBLE) / CAST(tot4 AS DOUBLE) AS mkt_share,
             CAST(nat4 AS BIGINT) AS nat4, CAST(tot4 AS BIGINT) AS tot4
      FROM (
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               sum(CASE WHEN sn.n_name = 'NATION_3'
                        THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                             * (100 - CAST(round(l_discount * 100) AS BIGINT))
                        ELSE 0 END) AS nat4,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS tot4
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE p_type = 'PROMO'
          AND EXISTS (SELECT 1 FROM customer
                      JOIN nation cn ON c_nationkey = cn.n_nationkey
                      JOIN region ON cn.n_regionkey = r_regionkey
                      WHERE c_custkey = o_custkey AND r_name = 'AMERICA')
        GROUP BY 1)
    """))

  /** Q9: product-type profit by nation and year. Supply cost is the
    * analogue `retail_cents * 50` (half retail, rev4-scaled), so the
    * amount stays a single exact BIGINT sum per group; l_quantity is
    * integral so its BIGINT cast is lossless. */
  val q9 = QueryDef(
    "q9_profit",
    (spark, dir) =>
      Tables.lineitem(spark, dir)
        // broadcast: SF-GROWING x2 — part and supplier scale with SF;
        // plan-stats gated. nation below: BOUNDED (spec-fixed 25).
        .join(Broadcasts.broadcastIfSmall(Tables.part(spark, dir)
          .filter(col("p_name").contains("widget"))
          .select(col("p_partkey"), col("p_retailprice"))),
          col("l_partkey") === col("p_partkey"))
        .join(Broadcasts.broadcastIfSmall(Tables.supplier(spark, dir)
          .select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(spark, dir)),
          col("s_nationkey") === col("n_nationkey"))
        .join(Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(sum(expr(s"$rev4 - CAST(round(p_retailprice * 100) AS BIGINT)" +
          " * 50 * CAST(l_quantity AS BIGINT)")).as("amt4"),
          count(lit(1)).as("n_items"))
        .select(col("nation"), col("o_year"),
          (col("amt4").cast("double") / lit(10000.0)).as("profit"),
          col("n_items")),
    Some("""
      SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(round(l_discount * 100) AS BIGINT))
                      - CAST(round(p_retailprice * 100) AS BIGINT) * 50
                        * CAST(l_quantity AS BIGINT))
                  AS DOUBLE) / 10000.0 AS profit,
             count(*) AS n_items
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN orders ON l_orderkey = o_orderkey
      WHERE p_name LIKE '%widget%'
      GROUP BY 1, 2
    """))

  /** Q12: late lines by category — priority-class conditional counts over
    * a one-year slice of late shipments, grouped by return flag (the
    * shipmode stand-in). One fact shuffle into a 3-group aggregation. */
  val q12 = QueryDef(
    "q12_late_priority",
    (spark, dir) =>
      Tables.lineitem(spark, dir)
        .filter(col("l_shipdate") >= lit("1997-01-01") &&
          col("l_shipdate") < lit("1998-01-01"))
        .join(Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr(late))
        .groupBy(col("l_returnflag"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).as("low_line_count")),
    Some("""
      SELECT l_returnflag,
             CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
        AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      GROUP BY 1
    """))

  /** Q15: top supplier — quarterly revenue per supplier, then select the
    * max via a broadcast scalar aggregate; equality on the EXACT BIGINT
    * revenue, so ties are engine-independent. The explicit non-null filter
    * on the join key matters for the PLAN, not the data: without it the
    * supplier join infers isnotnull(l_suppkey) into only ONE of the two
    * `rev` subtrees, the shared exchange stops canonicalizing equal, and
    * ReusedExchange (pinned in PlanAssertionsSpec) can't fire — two full
    * lineitem scans at 100 TB. */
  val q15 = QueryDef(
    "q15_top_supplier",
    (spark, dir) => {
      val rev = Tables.lineitem(spark, dir)
        .filter(col("l_suppkey").isNotNull &&
          col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1996-04-01"))
        .groupBy(col("l_suppkey"))
        .agg(sum(expr(rev4)).as("rev4v"))
      // broadcast: BOUNDED (single-row max) + SF-GROWING (supplier,
      // plan-stats gated).
      rev.crossJoin(broadcast(rev.agg(max(col("rev4v")).as("mx"))))
        .filter(col("rev4v") === col("mx"))
        .join(Broadcasts.broadcastIfSmall(Tables.supplier(spark, dir)),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          (col("rev4v").cast("double") / lit(10000.0)).as("total_revenue"))
    },
    Some("""
      WITH r AS (
        SELECT l_suppkey,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS rev4v
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY 1)
      SELECT s_suppkey, s_name, CAST(rev4v AS DOUBLE) / 10000.0 AS total_revenue
      FROM r JOIN supplier ON l_suppkey = s_suppkey
      WHERE rev4v = (SELECT max(rev4v) FROM r)
    """))

  /** Q17: small-quantity-order revenue — the correlated per-part average
    * decorrelated into a grouped sub-aggregation joined back on partkey.
    * The 20%-of-average test cross-multiplies in integers
    * (qty × 5 × count < sum) so the threshold is exact; the per-part
    * averages aggregate only the brand's lineitems (pre-filtered by the
    * broadcast part slice — same semantics, far less shuffle). */
  val q17 = QueryDef(
    "q17_small_qty_revenue",
    (spark, dir) => {
      val brandLi = Tables.lineitem(spark, dir)
        // broadcast: SF-GROWING — part slice; plan-stats gated.
        .join(Broadcasts.broadcastIfSmall(Tables.part(spark, dir)
          .filter(col("p_brand") === "Brand#1").select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"))
      val perPart = brandLi.groupBy(col("l_partkey").as("ap"))
        .agg(sum(col("l_quantity").cast("long")).as("sq"),
          count(lit(1)).as("cq"))
      brandLi.join(perPart, col("l_partkey") === col("ap"))
        .filter(col("l_quantity").cast("long") * lit(5L) * col("cq") <
          col("sq"))
        .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
          .as("cents"), count(lit(1)).as("n_items"))
        .select((col("cents").cast("double") / lit(700.0)).as("avg_yearly"),
          col("n_items"))
    },
    Some("""
      WITH a AS (
        SELECT l_partkey AS ap, CAST(sum(l_quantity) AS BIGINT) AS sq,
               CAST(count(*) AS BIGINT) AS cq
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand = 'Brand#1'
        GROUP BY 1)
      SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
               / 700.0 AS avg_yearly,
             count(*) AS n_items
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN a ON ap = l_partkey
      WHERE p_brand = 'Brand#1'
        AND CAST(l_quantity AS BIGINT) * 5 * cq < sq
    """))

  /** Q21: suppliers who kept orders waiting — for finished orders with
    * ≥2 suppliers where EXACTLY ONE supplier shipped late, count the
    * orders per (late) supplier of one nation. The classic
    * exists/not-exists pair is decorrelated through ONE per-(order,
    * supplier) aggregation whose exchange both consumers share: the
    * per-order distinct counts are a second-level aggregate over the pair
    * frame, and the late pairs are a filter of the SAME pair frame — so
    * lineitem is scanned once and the pair exchange is a ReusedExchange
    * (pinned in PlanAssertionsSpec), instead of two correlated probes or
    * a double fact build. The shape that survives 100 TB. */
  val q21 = QueryDef(
    "q21_waiting_supplier",
    (spark, dir) => {
      // Explicit non-null keys for the same reason as q15: the supplier
      // join infers isnotnull(l_suppkey) into only the late-pairs branch;
      // stating it once at the base keeps both pair subtrees canonically
      // equal so the pair exchange is reused (one lineitem scan).
      val pairs = Tables.lineitem(spark, dir)
        .filter(col("l_orderkey").isNotNull && col("l_suppkey").isNotNull)
        .join(Tables.orders(spark, dir)
          .filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(col("l_shipdate") > col("o_orderdate") + expr(late))
          .as("is_late"))
      val perOrder = pairs.groupBy(col("l_orderkey").as("ok"))
        .agg(count(lit(1)).as("n_supp"),
          count(when(col("is_late"), 1)).as("n_late_supp"))
      pairs.filter(col("is_late"))
        .select(col("l_orderkey"), col("l_suppkey"))
        .join(perOrder, col("l_orderkey") === col("ok"))
        .filter(col("n_supp") >= 2 && col("n_late_supp") === 1)
        // broadcast: SF-GROWING — ≤ one row per supplier (nation slice
        // only filters: BOUNDED); gated on supplier's scan stats.
        .join({
          val supp = Tables.supplier(spark, dir)
          Broadcasts.broadcastSizedBy(supp
            .join(broadcast(Tables.nation(spark, dir)
              .filter(col("n_name") === "NATION_5")),
              col("s_nationkey") === col("n_nationkey"))
            .select(col("s_suppkey"), col("s_name")), supp)
        }, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
    },
    Some("""
      WITH li AS (
        SELECT l_orderkey, l_suppkey,
               l_shipdate > o_orderdate + INTERVAL 60 DAY AS is_late
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F'),
      po AS (
        SELECT l_orderkey AS ok, count(DISTINCT l_suppkey) AS n_supp,
               count(DISTINCT CASE WHEN is_late THEN l_suppkey END)
                 AS n_late_supp
        FROM li GROUP BY 1)
      SELECT s_name, count(*) AS numwait
      FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM li WHERE is_late) x
      JOIN po ON l_orderkey = ok
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_supp >= 2 AND n_late_supp = 1 AND n_name = 'NATION_5'
      GROUP BY 1
    """))

  /** Q2 analogue: cheapest observed supplier per part in a region — the
    * correlated-min subquery decorrelated into a grouped min + window
    * rank. Unit price is integer milli-cents via integer division
    * (identical truncation both engines on positive values); suppkey
    * breaks ties deterministically. */
  val q2 = QueryDef(
    "q2_min_cost_supplier",
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      // broadcast: SF-GROWING — ≤ one row per supplier (nation ⋈ region
      // slice is BOUNDED ≤ 25 rows and only filters/decorates); gated on
      // supplier's scan stats.
      val supp = Tables.supplier(spark, dir)
      val regionSupp = Broadcasts.broadcastSizedBy(supp
        .join(broadcast(Tables.nation(spark, dir)
          .join(broadcast(Tables.region(spark, dir)
            .filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_name")), supp)
      val w = Window.partitionBy(col("p_partkey"))
        .orderBy(col("unit_m").asc, col("s_suppkey").asc)
      Tables.lineitem(spark, dir)
        // broadcast: SF-GROWING — part slice; plan-stats gated.
        .join(Broadcasts.broadcastIfSmall(Tables.part(spark, dir)
          .filter(col("p_size").between(10, 15) && col("p_type") === "STANDARD")
          .select(col("p_partkey"), col("p_name"))),
          col("l_partkey") === col("p_partkey"))
        .join(regionSupp, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("p_partkey"), col("p_name"), col("s_suppkey"),
          col("s_name"), col("n_name"))
        .agg(min(expr("CAST(round(l_extendedprice * 100) AS BIGINT) * 1000" +
          " DIV CAST(l_quantity AS BIGINT)")).as("unit_m"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("p_partkey"), col("p_name"), col("s_suppkey"),
          col("s_name"), col("n_name"), col("unit_m"))
    },
    Some("""
      WITH u AS (
        SELECT p_partkey, p_name, s_suppkey, s_name, n_name,
               min(CAST(round(l_extendedprice * 100) AS BIGINT) * 1000
                   // CAST(l_quantity AS BIGINT)) AS unit_m
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE p_size BETWEEN 10 AND 15 AND p_type = 'STANDARD' AND r_name = 'ASIA'
        GROUP BY 1, 2, 3, 4, 5)
      SELECT p_partkey, p_name, s_suppkey, s_name, n_name, unit_m
      FROM (SELECT *, row_number() OVER (PARTITION BY p_partkey
                      ORDER BY unit_m ASC, s_suppkey ASC) AS rn FROM u)
      WHERE rn = 1
    """))

  /** Q11 analogue: important parts by traded value for one nation's
    * suppliers — grouped value per part, kept when it exceeds 0.1% of the
    * grand total. The threshold cross-multiplies BIGINTs against a
    * broadcast scalar aggregate (no double quotient, no second scan
    * of the base table at threshold time). */
  val q11 = QueryDef(
    "q11_part_value",
    (spark, dir) => {
      // broadcast: SF-GROWING — ≤ one row per supplier (nation slice
      // BOUNDED); gated on supplier's scan stats.
      val supp = Tables.supplier(spark, dir)
      val natSupp = Broadcasts.broadcastSizedBy(supp
        .join(broadcast(Tables.nation(spark, dir)
          .filter(col("n_name") === "NATION_7")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey")), supp)
      val vals = Tables.lineitem(spark, dir)
        .join(natSupp, col("l_suppkey") === col("s_suppkey"), "left_semi")
        .groupBy(col("l_partkey"))
        .agg(sum(expr(rev4)).as("val4"))
      // broadcast: BOUNDED — single-row global aggregate.
      vals.crossJoin(broadcast(vals.agg(sum(col("val4")).as("tot4"))))
        .filter(col("val4") * lit(1000L) > col("tot4"))
        .select(col("l_partkey"),
          (col("val4").cast("double") / lit(10000.0)).as("part_value"))
    },
    Some("""
      WITH v AS (
        SELECT l_partkey,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS val4
        FROM lineitem
        WHERE EXISTS (SELECT 1 FROM supplier
                      JOIN nation ON s_nationkey = n_nationkey
                      WHERE s_suppkey = l_suppkey AND n_name = 'NATION_7')
        GROUP BY 1)
      SELECT l_partkey, CAST(val4 AS DOUBLE) / 10000.0 AS part_value
      FROM v
      WHERE val4 * 1000 > (SELECT sum(val4) FROM v)
    """))

  /** Q16 analogue: supplier diversity per part group — distinct supplier
    * counts over the observed (part, supplier) pairs, excluding
    * complained-about suppliers (negative balance) via a broadcast anti
    * join. The pair-distinct runs BEFORE the part join, so the count
    * aggregation sees each relationship once. */
  val q16 = QueryDef(
    "q16_supplier_cnt",
    (spark, dir) =>
      Tables.lineitem(spark, dir)
        .select(col("l_partkey"), col("l_suppkey")).distinct()
        // broadcast: SF-GROWING x2 — supplier and part slices scale with
        // SF; plan-stats gated.
        .join(Broadcasts.broadcastIfSmall(Tables.supplier(spark, dir)
          .filter(col("s_acctbal") < 0).select(col("s_suppkey"))),
          col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(Broadcasts.broadcastIfSmall(Tables.part(spark, dir)
          .filter(col("p_brand") =!= "Brand#1" &&
            col("p_size").isin(5, 10, 15, 20))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt")),
    Some("""
      SELECT p_brand, p_type, p_size,
             count(DISTINCT l_suppkey) AS supplier_cnt
      FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
      JOIN part ON l_partkey = p_partkey
      WHERE p_brand <> 'Brand#1' AND p_size IN (5, 10, 15, 20)
        AND NOT EXISTS (SELECT 1 FROM supplier
                        WHERE s_suppkey = l_suppkey AND s_acctbal < 0)
      GROUP BY 1, 2, 3
    """))

  /** Q20 analogue: suppliers with excess observed volume — the last of the
    * 22 TPC-H shapes (semi join against an aggregated-threshold subquery
    * over the observed part-supplier relationships). With no partsupp
    * table, "available quantity" := the pair's all-time observed quantity,
    * and the excess test is `total > 2 × one-year-window quantity` (the
    * pair shipped less than half its volume recently). One shuffle on
    * (l_partkey, l_suppkey) computes BOTH sums; everything downstream is
    * dim-sized: part slice broadcast-semi onto the pair aggregate, the
    * surviving suppkeys broadcast-semi onto the supplier dim. Quantities
    * are integral, so the threshold compares exact BIGINTs. */
  val q20 = QueryDef(
    "q20_excess_volume",
    (spark, dir) => {
      val pairs = Tables.lineitem(spark, dir)
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("l_quantity").cast("long")).as("tot_qty"),
          sum(when(col("l_shipdate") >= lit("1996-01-01") &&
            col("l_shipdate") < lit("1997-01-01"),
            col("l_quantity").cast("long")).otherwise(0L)).as("win_qty"))
      val excessSupp = pairs
        .filter(col("tot_qty") > lit(2L) * col("win_qty"))
        // broadcast: SF-GROWING — part slice; plan-stats gated.
        .join(Broadcasts.broadcastIfSmall(Tables.part(spark, dir)
          .filter(col("p_name").contains("widget")).select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"), "left_semi")
        .select(col("l_suppkey")).distinct()
      Tables.supplier(spark, dir)
        // broadcast: BOUNDED — nation slice ≤ 25 rows.
        .join(broadcast(Tables.nation(spark, dir)
          .filter(col("n_name") === "NATION_2")),
          col("s_nationkey") === col("n_nationkey"))
        // broadcast: SF-GROWING — excessSupp is a derived distinct of
        // supplier keys (≤ one row per supplier); join-derived plan-stats
        // are useless, so gate on supplier's scan stats.
        .join(Broadcasts.broadcastSizedBy(excessSupp,
          Tables.supplier(spark, dir)),
          col("s_suppkey") === col("l_suppkey"),
          "left_semi")
        .select(col("s_suppkey"), col("s_name"))
    },
    Some("""
      WITH pair AS (
        SELECT l_partkey, l_suppkey,
               CAST(sum(l_quantity) AS BIGINT) AS tot_qty,
               CAST(sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
                              AND l_shipdate < TIMESTAMP '1997-01-01'
                             THEN l_quantity ELSE 0 END) AS BIGINT) AS win_qty
        FROM lineitem GROUP BY 1, 2)
      SELECT s_suppkey, s_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_2'
        AND EXISTS (SELECT 1 FROM pair JOIN part ON l_partkey = p_partkey
                    WHERE l_suppkey = s_suppkey AND p_name LIKE '%widget%'
                      AND tot_qty > 2 * win_qty)
    """))

  val defs: Seq[QueryDef] = Seq(
    q2, q4, q8, q9, q11, q12, q15, q16, q17, q20, q21)
}
