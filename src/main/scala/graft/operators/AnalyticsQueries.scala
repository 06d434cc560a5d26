package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Round-2 analytics breadth (SURVEY §2.2): interpolated quantiles,
  * moment-based statistical aggregates, array aggregation, histogram
  * binning, deterministic stratified sampling, and three classic TPC-H
  * join/aggregation shapes (Q5/Q13/Q18 analogues on the driver's schema).
  *
  * Oracle-parity rules (same as the rest of the engine): floating-point
  * results are produced by ONE double expression with identical operand
  * shape on both sides, from exact integer moments wherever possible;
  * interpolated quantiles run on integral values so the interpolation is
  * exact at quarter fractions.
  */
object AnalyticsQueries {

  /** Interpolated (continuous) quantiles per group — Spark `percentile`
    * vs DuckDB `quantile_cont`. l_quantity is integral, so the linear
    * interpolation at quarter fractions is exact in doubles in both
    * engines regardless of evaluation order. Quantiles are emitted as
    * three scalar columns, not ARRAY: the driver's compare sorts rows
    * via pandas, which cannot hash array cells (r03 failure). */
  val quantilesCont = QueryDef(
    "quantiles_cont",
    (spark, dir) =>
      Tables.lineitem(spark, dir)
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_quantity, array(0.25D, 0.5D, 0.75D))")
          .as("q"))
        .select(col("l_returnflag"),
          col("q")(0).as("q25"), col("q")(1).as("q50"), col("q")(2).as("q75")),
    Some("""
      SELECT l_returnflag,
             quantile_cont(l_quantity, 0.25) AS q25,
             quantile_cont(l_quantity, 0.5)  AS q50,
             quantile_cont(l_quantity, 0.75) AS q75
      FROM lineitem GROUP BY 1
    """))

  /** Statistical aggregates (variance / stddev / correlation) derived from
    * EXACT integer moments — sum, sum of squares, cross products in BIGINT
    * — then one double expression per statistic. Welford-style built-ins
    * (stddev/corr) differ across engines in last-ulp rounding because
    * their partial-merge order differs; integer moments sidestep that
    * while demonstrating the same partial-aggregation shape (map-side
    * combine of 6 longs per group — at 100 TB the shuffle moves
    * n_groups × 6 longs, not the table). disc_pct = round(l_discount*100)
    * is exact: the product is within one ulp of an integer in both
    * engines. */
  val statsAgg = QueryDef(
    "stats_agg",
    (spark, dir) =>
      Tables.lineitem(spark, dir)
        .select(col("l_returnflag"),
          col("l_quantity").cast("long").as("q"),
          expr("CAST(round(l_discount * 100) AS BIGINT)").as("d"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("q")).as("sq"), sum(col("q") * col("q")).as("sqq"),
          sum(col("d")).as("sd"), sum(col("d") * col("d")).as("sdd"),
          sum(col("q") * col("d")).as("sqd"))
        .select(col("l_returnflag"), col("n"),
          // var = (n·Σq² − (Σq)²) / (n·(n−1)): numerator and denominator
          // stay exact BIGINT, ONE double division at the end
          ((col("n") * col("sqq") - col("sq") * col("sq")).cast("double") /
            (col("n") * (col("n") - 1)).cast("double")).as("var_qty"),
          sqrt((col("n") * col("sqq") - col("sq") * col("sq")).cast("double") /
            (col("n") * (col("n") - 1)).cast("double")).as("stddev_qty"),
          ((col("n") * col("sqd") - col("sq") * col("sd")).cast("double") /
            (sqrt((col("n") * col("sqq") - col("sq") * col("sq")).cast("double")) *
              sqrt((col("n") * col("sdd") - col("sd") * col("sd")).cast("double"))))
            .as("corr_qty_disc")),
    Some("""
      SELECT l_returnflag, n,
             CAST(n * sqq - sq * sq AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE) AS var_qty,
             sqrt(CAST(n * sqq - sq * sq AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE)) AS stddev_qty,
             CAST(n * sqd - sq * sd AS DOUBLE) /
               (sqrt(CAST(n * sqq - sq * sq AS DOUBLE)) *
                sqrt(CAST(n * sdd - sd * sd AS DOUBLE))) AS corr_qty_disc
      FROM (
        SELECT l_returnflag, count(*) AS n,
               sum(q) AS sq, sum(q * q) AS sqq,
               sum(d) AS sd, sum(d * d) AS sdd, sum(q * d) AS sqd
        FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q,
                     CAST(round(l_discount * 100) AS BIGINT) AS d
              FROM lineitem)
        GROUP BY 1)
    """))

  /** Array aggregation family: per market segment, the sorted distinct
    * list of order priorities seen, its size, and a membership probe —
    * collect_set → sort_array vs array_agg → list_distinct → list_sort.
    * The list column is serialized with array_join for the output: the
    * driver's compare sorts rows via pandas, which cannot hash array
    * cells (r03 failure); the array ops still run, only the final
    * projection is scalar. */
  val arrayFuncs = QueryDef(
    "array_funcs",
    (spark, dir) =>
      Tables.customer(spark, dir)
        .join(Tables.orders(spark, dir),
          col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(sort_array(collect_set(col("o_orderpriority"))).as("ps"))
        .select(col("c_mktsegment"),
          array_join(col("ps"), "|").as("priorities"),
          size(col("ps")).cast("long").as("n_priorities"),
          array_contains(col("ps"), "1-URGENT").as("has_urgent")),
    Some("""
      SELECT c_mktsegment,
             array_to_string(list_sort(list_distinct(array_agg(o_orderpriority))),
                             '|') AS priorities,
             len(list_distinct(array_agg(o_orderpriority))) AS n_priorities,
             list_contains(list_distinct(array_agg(o_orderpriority)),
                           '1-URGENT') AS has_urgent
      FROM customer JOIN orders ON c_custkey = o_custkey
      GROUP BY 1
    """))

  /** Histogram binning: 10 fixed-width quantity buckets. Bin edges sit at
    * x.5 so integral quantities can never land on a boundary — the bin
    * arithmetic (identical expression both sides) is therefore exact. A
    * map-side-combined count per bucket: the 100 TB shape for any
    * histogram. */
  val histogramBins = QueryDef(
    "histogram_bins",
    (spark, dir) =>
      Tables.lineitem(spark, dir)
        .select(expr(
          "CAST(floor((l_quantity - 0.5D) / 5.0D) AS BIGINT) + 1").as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_items")),
    Some("""
      SELECT CAST(floor((l_quantity - 0.5) / 5.0) AS BIGINT) + 1 AS bucket,
             count(*) AS n_items
      FROM lineitem GROUP BY 1
    """))

  /** Deterministic stratified sampling: top-20 documents per source by a
    * content-derived md5 rank — reproducible across engines and runs (no
    * RNG), one window per stratum; at 100 TB this is the standard
    * "hash-order sample per shard" trick (rank key is uniform, so the
    * sample is unbiased, and the window never sees more than one stratum
    * per partition). */
  val stratifiedSample = QueryDef(
    "stratified_sample",
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("source"))
        .orderBy(col("rank_key"), col("doc_id"))
      Tables.documents(spark, dir)
        .select(col("doc_id"), col("source"),
          md5(concat(col("doc_id").cast("string"), lit(":"), col("lang")))
            .as("rank_key"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 20)
        .select(col("doc_id"), col("source"), col("rn").cast("long").as("rn"))
    },
    Some("""
      SELECT doc_id, source, rn FROM (
        SELECT doc_id, source,
               row_number() OVER (
                 PARTITION BY source
                 ORDER BY md5(doc_id || ':' || lang), doc_id) AS rn
        FROM documents)
      WHERE rn <= 20
    """))

  private val KmvK = 64

  /** KMV (k-minimum-values) distinct-count sketch, per return flag: keep
    * the k smallest md5-derived 32-bit hashes; the k-th smallest,
    * normalized to [0,1), estimates density so est ≈ (k-1)/h_(k).
    * Implemented as the [[graft.functions.KmvSketch]] typed Aggregator
    * (the UDAF surface): the raw hash stream feeds it directly — no
    * distinct, no window rank — and map-side partial aggregation moves at
    * most k longs per (partition, group). Unlike engine-native
    * approx_count_distinct (HLL, implementation-defined), the sketch is
    * deterministic md5 arithmetic, so the DuckDB oracle computes the
    * identical estimate — an exactly-checkable approximate operator. */
  val kmvDistinct = QueryDef(
    "approx_distinct_kmv",
    (spark, dir) => {
      val kmv = udaf(new graft.functions.KmvSketch(KmvK))
      Tables.lineitem(spark, dir)
        .select(col("l_returnflag").as("grp"),
          conv(substring(md5(col("l_partkey").cast("string")), 1, 8), 16, 10)
            .cast("long").as("h"))
        .groupBy(col("grp"))
        .agg(kmv(col("h")).as("s"))
        .select(col("grp"), col("s._1").as("k_used"), col("s._2").as("hk"))
        .select(col("grp"), col("k_used"),
          when(col("k_used") < KmvK, col("k_used").cast("double"))
            .otherwise(lit((KmvK - 1).toDouble) /
              (col("hk").cast("double") / 4294967296.0))
            .as("est_distinct"))
    },
    Some(s"""
      WITH h AS (
        SELECT DISTINCT l_returnflag AS grp,
               CAST(list_sum(list_transform(range(8), i ->
                 (strpos('0123456789abcdef',
                         substr(md5(CAST(l_partkey AS VARCHAR)), i + 1, 1)) - 1)
                   * (16 ** (7 - i)))) AS BIGINT) AS h
        FROM lineitem),
      r AS (SELECT grp, h,
                   row_number() OVER (PARTITION BY grp ORDER BY h ASC) AS rn
            FROM h),
      k AS (SELECT grp, CAST(count(*) AS BIGINT) AS k_used, max(h) AS hk
            FROM r WHERE rn <= $KmvK GROUP BY 1)
      SELECT grp, k_used,
             CASE WHEN k_used < $KmvK THEN CAST(k_used AS DOUBLE)
                  ELSE ${(KmvK - 1).toDouble} /
                       (CAST(hk AS DOUBLE) / 4294967296.0)
             END AS est_distinct
      FROM k
    """))

  private val ThetaK = 16

  /** Theta-sketch set-INTERSECTION estimate (sketch composition, the
    * companion to [[kmvDistinct]]'s counting): estimate the overlap of two
    * sources' token vocabularies from their k-minimum-value sketches —
    * θ = the k-th smallest hash of the UNION, the estimate counts hashes
    * ≤ θ present in both sides, scaled by 1/θ_norm. Exactly the merge
    * machinery a 100 TB system uses to answer overlap questions from
    * per-shard sketches without re-reading shards. The same row carries
    * the EXACT intersection, so sketch error is visible in the output —
    * and both are deterministic md5 arithmetic, so the DuckDB oracle
    * reproduces estimate AND truth bit-for-bit. */
  val thetaOverlap = QueryDef(
    "approx_overlap_theta",
    (spark, dir) => {
      val h = Tables.documents(spark, dir)
        .filter(col("source").isin("src0", "src1"))
        .select(col("source"),
          explode(split(col("text"), " ")).as("tok"))
        .select(col("source"),
          conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long").as("h"))
        .distinct()
        .localCheckpoint(eager = false) // feeds union, both join sides
      val a = h.filter(col("source") === "src0").select(col("h"))
      val b = h.filter(col("source") === "src1").select(col("h").as("hb"))
      // broadcast: BOUNDED — a single-row aggregate over a limit(ThetaK).
      val stats = broadcast(
        a.union(b.select(col("hb").as("h"))).distinct()
          .orderBy(col("h").asc).limit(ThetaK)
          .agg(max(col("h")).as("theta"), count(lit(1)).as("k_used")))
      val both = a.join(b, col("h") === col("hb")) // exact intersection
      both.crossJoin(stats)
        .agg(
          first(col("k_used")).as("k_used"),
          first(col("theta")).as("theta"),
          sum(when(col("h") <= col("theta"), 1L).otherwise(0L)).as("n_cand"),
          count(lit(1)).as("n_exact"))
        .select(col("k_used"), col("n_cand"), col("n_exact"),
          when(col("k_used") < ThetaK, col("n_cand").cast("double"))
            .otherwise(col("n_cand").cast("double") /
              (col("theta").cast("double") / 4294967296.0))
            .as("est_inter"))
    },
    Some(s"""
      WITH h AS (
        SELECT DISTINCT source,
               CAST(list_sum(list_transform(range(8), i ->
                 (strpos('0123456789abcdef',
                         substr(md5(tok), i + 1, 1)) - 1)
                   * (16 ** (7 - i)))) AS BIGINT) AS h
        FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
              FROM documents WHERE source IN ('src0', 'src1'))),
      u AS (SELECT DISTINCT h FROM h ORDER BY h ASC LIMIT $ThetaK),
      s AS (SELECT max(h) AS theta, CAST(count(*) AS BIGINT) AS k_used FROM u),
      ab AS (SELECT a.h FROM h a JOIN h b ON a.h = b.h
             WHERE a.source = 'src0' AND b.source = 'src1')
      SELECT k_used,
             CAST(count(*) FILTER (WHERE h <= theta) AS BIGINT) AS n_cand,
             CAST(count(*) AS BIGINT) AS n_exact,
             CASE WHEN k_used < $ThetaK
                  THEN CAST(count(*) FILTER (WHERE h <= theta) AS DOUBLE)
                  ELSE CAST(count(*) FILTER (WHERE h <= theta) AS DOUBLE) /
                       (CAST(theta AS DOUBLE) / 4294967296.0)
             END AS est_inter
      FROM ab, s
      GROUP BY k_used, theta
    """))

  /** TPC-H Q5 analogue: revenue by nation for one region — the canonical
    * multi-way star join (customer ⋈ orders ⋈ lineitem ⋈ supplier ⋈ nation
    * ⋈ region) with small dims broadcast; the only shuffle is the final
    * group-by-nation. */
  val q5RegionRevenue = QueryDef(
    "q5_region_revenue",
    (spark, dir) => {
      // broadcast: BOUNDED — nation (25) and region (5) are spec-fixed.
      val n = broadcast(Tables.nation(spark, dir))
      val r = broadcast(Tables.region(spark, dir).filter(col("r_name") === "ASIA"))
      Tables.customer(spark, dir)
        .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
        // broadcast: SF-GROWING — supplier scales 10k x SF; plan-stats gated.
        .join(Broadcasts.broadcastIfSmall(Tables.supplier(spark, dir)),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(n, col("s_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        // exact integer money: cents × (100 − discount%) summed in BIGINT
        // (a plain double sum is order-sensitive in the last ulp and
        // diverges between engines), ONE double division at the end
        .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)" +
          " * (100 - CAST(round(l_discount * 100) AS BIGINT))")).as("rev4"),
          count(lit(1)).as("n_items"))
        .select(col("n_name"),
          (col("rev4").cast("double") / lit(10000.0)).as("revenue"),
          col("n_items"))
    },
    Some("""
      SELECT n_name,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                  AS DOUBLE) / 10000.0 AS revenue,
             count(*) AS n_items
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
      GROUP BY 1
    """))

  /** TPC-H Q13 analogue: distribution of orders-per-customer — LEFT OUTER
    * join so zero-order customers count, then a second aggregation over
    * the first's result (two shuffles, both on small keys). */
  val q13CustDistribution = QueryDef(
    "q13_cust_distribution",
    (spark, dir) =>
      Tables.customer(spark, dir)
        .join(Tables.orders(spark, dir),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist")),
    Some("""
      SELECT c_count, count(*) AS custdist FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY 1)
      GROUP BY 1
    """))

  /** TPC-H Q18 analogue: large-volume orders — aggregate lineitem per
    * order, HAVING-filter on the sum, join back to orders/customer. The
    * having-filter runs BEFORE the join (aggregation pushdown by
    * construction), so only qualifying orders shuffle into the join. */
  val q18LargeOrders = QueryDef(
    "q18_large_orders",
    (spark, dir) => {
      val big = Tables.lineitem(spark, dir)
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("total_qty"))
        .filter(col("total_qty") > 180)
      Tables.orders(spark, dir)
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("o_orderkey"), col("o_totalprice"),
          col("total_qty"))
    },
    Some("""
      SELECT c_name, o_orderkey, o_totalprice, total_qty
      FROM orders
      JOIN (SELECT l_orderkey, sum(l_quantity) AS total_qty
            FROM lineitem GROUP BY 1
            HAVING sum(l_quantity) > 180) big ON o_orderkey = l_orderkey
      JOIN customer ON o_custkey = c_custkey
    """))

  val defs: Seq[QueryDef] = Seq(
    quantilesCont, statsAgg, arrayFuncs, histogramBins, stratifiedSample,
    kmvDistinct, thetaOverlap, q5RegionRevenue, q13CustDistribution, q18LargeOrders)
}
