package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SQL-surface breadth beyond SURVEY §2.1/§2.2's first wave: grouping sets,
  * pivot/unpivot reshaping, time-range window frames, navigation window
  * functions, string/JSON/date scalar families, FILTER-style conditional
  * aggregation, and character-n-gram Jaccard. All oracle-checked; the same
  * cross-engine determinism rules as everywhere else apply (exact decimal
  * sums cast to double, integer results cast to BIGINT on the DuckDB side
  * where its sums widen to HUGEINT, ratio doubles from identical expression
  * shapes).
  */
object SqlSurfaceQueries {

  /** GROUPING SETS aggregation (beyond rollup/cube: arbitrary set list) —
    * per-flag, per-status, both, and grand-total rows in one pass, with
    * grouping() flags disambiguating natural NULLs from subtotal NULLs. */
  val groupingSets = QueryDef(
    "grouping_sets_agg",
    (spark, dir) => {
      Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem_gs")
      spark.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
               CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               count(*) AS n
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                                (l_returnflag, l_linestatus), ())
      """)
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
             CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             count(*) AS n
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                              (l_returnflag, l_linestatus), ())
    """))

  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** Pivot: per-user event counts, one column per event type. Values are
    * listed explicitly — at 100 TB an implicit pivot means a driver-side
    * distinct scan before planning; explicit values keep it one pass. */
  val pivotWide = QueryDef(
    "pivot_wide",
    (spark, dir) => {
      val p = Tables.events(spark, dir)
        .groupBy(col("user_id"))
        .pivot("event_type", eventTypes)
        .agg(count(lit(1)))
      // pivot leaves null for absent (user, type) cells; the oracle's
      // FILTER counts yield 0 — normalize
      p.select(col("user_id") +: eventTypes.map(t =>
        coalesce(col(t), lit(0L)).as(t)): _*)
    },
    Some {
      val cols = eventTypes.map(t =>
        s"count(*) FILTER (WHERE event_type = '$t') AS $t").mkString(", ")
      s"SELECT user_id, $cols FROM events GROUP BY user_id"
    })

  /** Unpivot (melt): wide per-flag measures back to long (measure, value)
    * rows — the inverse reshape, Dataset.unpivot in Spark. */
  val unpivotLong = QueryDef(
    "unpivot_long",
    (spark, dir) => {
      val wide = Tables.lineitem(spark, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          expr("CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)")
            .as("sum_qty"),
          expr("CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)")
            .as("sum_price"),
          count(lit(1)).cast("double").as("n_lines"))
      wide.unpivot(
        Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("n_lines")),
        "measure", "val")
    },
    Some("""
      WITH wide AS (
        SELECT l_returnflag,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
               CAST(count(*) AS DOUBLE) AS n_lines
        FROM lineitem GROUP BY 1)
      SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS val FROM wide
      UNION ALL
      SELECT l_returnflag, 'sum_price', sum_price FROM wide
      UNION ALL
      SELECT l_returnflag, 'n_lines', n_lines FROM wide
    """))

  /** Event-time RANGE window frame: per event, how many of the same user's
    * events fall in the trailing hour — a time-range frame over the event
    * timeline (count/min/max only: order-independent within the frame, so
    * both engines agree bit-for-bit). */
  val windowRangeFrame = QueryDef(
    "window_range_frame",
    (spark, dir) => {
      val frame = "PARTITION BY user_id ORDER BY ts " +
        "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW"
      Tables.events(spark, dir).select(
        col("user_id"), col("event_id"), col("ts"),
        expr(s"count(*) OVER ($frame)").as("n_trailing_hour"),
        expr(s"min(value) OVER ($frame)").as("min_trailing"),
        expr(s"max(value) OVER ($frame)").as("max_trailing"))
    },
    Some("""
      SELECT user_id, event_id, ts,
             count(*) OVER w AS n_trailing_hour,
             min(value) OVER w AS min_trailing,
             max(value) OVER w AS max_trailing
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """))

  /** Navigation window functions (first/last/nth value, ntile, percent_rank,
    * cume_dist) over a deterministic total order (price with unique-key
    * tiebreak). last/nth need the full-partition frame — the default frame
    * stops at CURRENT ROW. */
  val windowNavigation = QueryDef(
    "window_navigation",
    (spark, dir) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
      val full = w.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      Tables.orders(spark, dir).select(
        col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
        first_value(col("o_orderkey")).over(w).as("cheapest_key"),
        last_value(col("o_orderkey")).over(full).as("priciest_key"),
        nth_value(col("o_orderkey"), 3).over(full).as("third_key"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
    },
    Some("""
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             first_value(o_orderkey) OVER w AS cheapest_key,
             last_value(o_orderkey) OVER wf AS priciest_key,
             nth_value(o_orderkey, 3) OVER wf AS third_key,
             CAST(ntile(4) OVER w AS BIGINT) AS quartile,
             percent_rank() OVER w AS pct_rank,
             cume_dist() OVER w AS cume
      FROM orders
      WINDOW w AS (PARTITION BY o_orderpriority
                   ORDER BY o_totalprice ASC, o_orderkey ASC),
             wf AS (PARTITION BY o_orderpriority
                    ORDER BY o_totalprice ASC, o_orderkey ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """))

  /** String scalar family over documents: regex extraction, case mapping,
    * padding, reversal, split indexing, edit distance — each a function
    * both engines implement with identical semantics. */
  val stringFuncs = QueryDef(
    "string_funcs",
    (spark, dir) =>
      Tables.documents(spark, dir).select(
        col("doc_id"),
        regexp_extract(col("text"), "^(\\w+)", 1).as("first_word"),
        upper(col("lang")).as("lang_uc"),
        lpad(col("lang"), 6, ".").as("lang_pad"),
        reverse(col("source")).as("source_rev"),
        expr("split_part(text, ' ', 2)").as("second_tok"),
        levenshtein(col("lang"), col("source")).cast("long").as("lev"),
        translate(col("source"), "aeiou", "_____").as("source_tr"),
        length(col("text")).cast("long").as("n_cp")),
    Some("""
      SELECT doc_id,
             regexp_extract(text, '^(\w+)', 1) AS first_word,
             upper(lang) AS lang_uc,
             lpad(lang, 6, '.') AS lang_pad,
             reverse(source) AS source_rev,
             split_part(text, ' ', 2) AS second_tok,
             CAST(levenshtein(lang, source) AS BIGINT) AS lev,
             translate(source, 'aeiou', '_____') AS source_tr,
             CAST(length(text) AS BIGINT) AS n_cp
      FROM documents
    """))

  /** JSON extraction from the events.props payload (op 9's batch shape:
    * json decode as an expression, pushdown-friendly). String-typed path
    * extraction plus a numeric cast of the extracted value. */
  val jsonExtract = QueryDef(
    "json_extract",
    (spark, dir) =>
      Tables.events(spark, dir).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        get_json_object(col("props"), "$.k").cast("long").as("k_num"),
        get_json_object(col("props"), "$.missing").as("absent")),
    Some("""
      SELECT event_id,
             json_extract_string(props, '$.k') AS k_str,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
             json_extract_string(props, '$.missing') AS absent
      FROM events
    """))

  /** Conditional (FILTER-clause) aggregation: per-priority order stats with
    * predicate-scoped aggregates — count/min/max only (order-independent). */
  val filteredAgg = QueryDef(
    "filtered_agg",
    (spark, dir) =>
      Tables.orders(spark, dir)
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_all"),
          count(when(col("o_orderstatus") === "F", lit(1))).as("n_f"),
          count(when(col("o_totalprice") > 200000.0, lit(1))).as("n_big"),
          min(when(col("o_orderstatus") === "F", col("o_totalprice")))
            .as("min_f_price"),
          max(when(col("o_orderstatus") === "F", col("o_totalprice")))
            .as("max_f_price")),
    Some("""
      SELECT o_orderpriority, count(*) AS n_all,
             count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
             count(*) FILTER (WHERE o_totalprice > 200000.0) AS n_big,
             min(o_totalprice) FILTER (WHERE o_orderstatus = 'F') AS min_f_price,
             max(o_totalprice) FILTER (WHERE o_orderstatus = 'F') AS max_f_price
      FROM orders GROUP BY 1
    """))

  /** Character-3-gram Jaccard between consecutive doc ids — the char-level
    * n-gram similarity variant (word-level lives in the dedup family). The
    * deterministic (id, id+1) pairing exercises the shingle machinery
    * without a quadratic candidate join. */
  val charNgramJaccard = QueryDef(
    "char_ngram_jaccard",
    (spark, dir) => {
      graft.functions.NgramExprs.register(spark)
      val docs = Tables.documents(spark, dir)
      // The (2k, 2k+1) pairing is known up front, so the right plan never
      // ships grams at all: join the two TEXTS per pair (one shuffle of
      // corpus bytes), then gram-generate (codegen char_ngrams), dedup and
      // intersect per ROW with array functions. The generic
      // unknown-pairing path — explode + bucket join — lives in the
      // MinHash/LSH family; this shape is what you run when the pairing
      // is an id projection. Replaced a 2-shuffle formulation moving ~300×
      // the rows.
      val a = docs.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id").as("doc_a"), col("text").as("ta"))
      val b = docs.filter(col("doc_id") % 2 === 1)
        .select((col("doc_id") - 1).as("doc_a"),
          col("doc_id").as("doc_b"), col("text").as("tb"))
      a.join(b, "doc_a")
        .withColumn("ga",
          array_distinct(call_function("char_ngrams", col("ta"), lit(3))))
        .withColumn("gb",
          array_distinct(call_function("char_ngrams", col("tb"), lit(3))))
        .select(col("doc_a"), col("doc_b"),
          size(array_intersect(col("ga"), col("gb"))).cast("long")
            .as("n_inter"),
          size(col("ga")).cast("long").as("n_a"),
          size(col("gb")).cast("long").as("n_b"))
        .select(col("doc_a"), col("doc_b"), col("n_inter"),
          (col("n_inter").cast("double") /
            (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
            .as("jaccard"))
    },
    Some("""
      WITH grams AS (
        SELECT DISTINCT doc_id, substr(text, i, 3) AS g
        FROM (SELECT doc_id, text,
                     unnest(generate_series(1,
                       greatest(length(text) - 2, 1))) AS i
              FROM documents)),
      sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1),
      pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        WHERE a.doc_id % 2 = 0),
      inter AS (
        SELECT doc_a, doc_b, count(*) AS n_inter
        FROM pairs
        JOIN grams ga ON ga.doc_id = doc_a
        JOIN grams gb ON gb.doc_id = doc_b AND gb.g = ga.g
        GROUP BY 1, 2)
      SELECT doc_a, doc_b,
             coalesce(n_inter, 0) AS n_inter,
             CAST(coalesce(n_inter, 0) AS DOUBLE) /
               CAST(sa.n + sb.n - coalesce(n_inter, 0) AS DOUBLE) AS jaccard
      FROM pairs
      LEFT JOIN inter USING (doc_a, doc_b)
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
    """))

  /** Datetime scalar family: field extraction, truncation, formatting, and
    * epoch round-trip (formatted as strings where the engines' native
    * renderings differ). */
  val dateFuncs = QueryDef(
    "date_funcs",
    (spark, dir) =>
      Tables.events(spark, dir).select(
        col("event_id"),
        year(col("ts")).cast("long").as("y"),
        month(col("ts")).cast("long").as("m"),
        dayofmonth(col("ts")).cast("long").as("d"),
        hour(col("ts")).cast("long").as("h"),
        date_format(col("ts"), "yyyy-MM-dd").as("day_str"),
        expr("CAST(date_trunc('HOUR', ts) AS TIMESTAMP_NTZ)").as("hour_start"),
        expr("CAST(unix_timestamp(ts) AS BIGINT)").as("epoch_s")),
    Some("""
      SELECT event_id,
             CAST(year(ts) AS BIGINT) AS y,
             CAST(month(ts) AS BIGINT) AS m,
             CAST(day(ts) AS BIGINT) AS d,
             CAST(hour(ts) AS BIGINT) AS h,
             strftime(ts, '%Y-%m-%d') AS day_str,
             date_trunc('hour', ts) AS hour_start,
             CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s
      FROM events
    """))

  val defs: Seq[QueryDef] = Seq(
    groupingSets, pivotWide, unpivotLong, windowRangeFrame, windowNavigation,
    stringFuncs, jsonExtract, filteredAgg, charNgramJaccard, dateFuncs)
}
