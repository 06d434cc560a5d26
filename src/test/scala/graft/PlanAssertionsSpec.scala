package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions for the scale-critical queries: these encode
  * the 100 TB design decisions (pushdown reaches the scan, small sides
  * broadcast, no unnecessary shuffles) as tests, so a refactor that
  * silently degrades a plan fails CI rather than a cluster run. */
class PlanAssertionsSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf)
      .queryExecution.executedPlan.toString

  test("scan_filter_prune: predicate and projection reach the parquet scan") {
    val p = plan("scan_filter_prune")
    assert(p.contains("PushedFilters: ["), "no pushed filters in:\n" + p)
    assert(!p.contains("PushedFilters: []"), "empty pushdown in:\n" + p)
    // projection pruning: the read schema must not include every column
    assert(p.contains("ReadSchema"), p)
  }

  test("star_join_revenue: dimension sides broadcast, never shuffled-merge-joined") {
    val p = plan("star_join_revenue")
    assert(p.contains("BroadcastHashJoin"), "expected broadcast join:\n" + p)
  }

  test("q3_topn_revenue: lineitem joins against a broadcast semi side") {
    val p = plan("q3_topn_revenue")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "expected broadcasted reduced orders side:\n" + p)
  }

  test("range_band_join: bucketed equi-join plans a hash join, not a nested loop") {
    val p = plan("range_band_join")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "range join degenerated to nested loop:\n" + p)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"), p)
  }

  test("q6_forecast_revenue: all three range predicates push to the scan") {
    val p = plan("q6_forecast_revenue")
    assert(p.contains("PushedFilters: [") && !p.contains("PushedFilters: []"), p)
    assert(p.contains("l_shipdate") && p.contains("l_discount") &&
      p.contains("l_quantity"), "expected all predicates at the scan:\n" + p)
  }

  test("q7/q10/q14/q19: dimension and part sides broadcast, facts never NLJ") {
    for (q <- Seq("q7_nation_volume", "q10_returned_revenue",
        "q14_promo_ratio", "q19_disjunctive")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q: no broadcast join:\n" + p)
      assert(!p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("CartesianProduct"), s"$q: degenerate join:\n" + p)
    }
  }

  test("approx_distinct_kmv: the sketch UDAF partially aggregates before the exchange") {
    // the point of the sketch: map-side combine ships <= k longs per
    // (partition, group), so a partial aggregate must sit below the shuffle
    val p = plan("approx_distinct_kmv")
    assert(p.contains("ObjectHashAggregate"),
      "typed Aggregator should plan ObjectHashAggregate:\n" + p)
    assert(p.contains("partial_kmvsketch") || p.contains("partial_"),
      "no partial aggregation below the exchange:\n" + p)
  }

  test("q22_idle_customers: recent-orders exclusion is a real anti join") {
    val p = plan("q22_idle_customers")
    assert(p.contains("LeftAnti"), "expected anti join:\n" + p)
  }

  test("quantity_band_nlj: tiny-side inequality join plans the broadcast NLJ deliberately") {
    val p = plan("quantity_band_nlj")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "expected deliberate broadcast NLJ over the 3-row band table:\n" + p)
  }

  test("asof_join: no cartesian product in the as-of pattern") {
    val p = plan("asof_join")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("topk_per_key: single exchange for the per-key window (no extra shuffle)") {
    val p = plan("topk_per_key")
    val shuffles = "Exchange (hashpartitioning|rangepartitioning)".r
      .findAllIn(p).size
    assert(shuffles <= 2, s"expected <= 2 shuffles, got $shuffles in:\n" + p)
  }

  test("q1_pricing_summary: partial aggregation before the exchange (map-side combine)") {
    val p = plan("q1_pricing_summary")
    val firstAgg = p.indexOf("HashAggregate")
    val firstExchange = p.indexOf("Exchange")
    assert(firstAgg >= 0 && firstExchange >= 0, p)
    // plan prints top-down: final agg, exchange, partial agg — a partial
    // agg must exist below the exchange
    assert(p.indexOf("HashAggregate", firstExchange) > firstExchange,
      "no partial aggregate below the shuffle:\n" + p)
  }

  test("q15/q11/q21: the self-referencing aggregate builds its fact scan ONCE (ReusedExchange)") {
    // Each of these queries consumes one aggregated frame twice (q15/q11:
    // the frame and its scalar max/sum; q21: the per-(order,supplier) pair
    // frame and its per-order rollup). The 100 TB property: the shared
    // exchange canonicalizes equal so the fact side is scanned and
    // shuffled once, not twice. AQE defers reuse to runtime (and at
    // sf0.001 empty-relation propagation can preempt it), so pin the
    // property via the static ReuseExchange rule with AQE off — canonical
    // exchange equality is exactly what AQE's stage cache keys on too.
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      for (q <- Seq("q15_top_supplier", "q11_part_value",
          "q21_waiting_supplier")) {
        val p = plan(q)
        assert(p.contains("ReusedExchange"),
          s"$q: shared aggregate subtree no longer reused:\n" + p)
        val liScans = p.split('\n')
          .count(l => l.contains("Scan parquet") && l.contains("lineitem"))
        assert(liScans == 1,
          s"$q: expected exactly one lineitem scan, got $liScans:\n" + p)
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("q20_excess_volume: the total/windowed sums share ONE lineitem scan") {
    // Q20 computes both the per-(part,supp) total and the date-windowed sum
    // as conditional aggregates over a single groupBy — the single-scan
    // formulation. Pin it: an innocent refactor into two aggregates would
    // double the 100 TB fact scan (the exact regression 415c253 fixed for
    // q15 when an inferred isnotnull split the subtrees).
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = plan("q20_excess_volume")
      val liScans = p.split('\n')
        .count(l => l.contains("Scan parquet") && l.contains("lineitem"))
      assert(liScans == 1,
        s"q20: expected exactly one lineitem scan, got $liScans:\n" + p)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("book_replay: final-book extraction aggregates, never windows the emission stream") {
    // The last emission per product comes from max_by partial aggregation
    // (one row per product-partition crosses the exchange), not a
    // row_number window that would shuffle and sort every emission — at
    // 100× the emission stream is the biggest intermediate in the query.
    val p = plan("book_replay")
    assert(!p.contains("Window"),
      "emission stream is being window-sorted:\n" + p)
    assert(p.contains("Aggregate"),
      "expected a (partial) aggregate for the final book:\n" + p)
  }

  test("bucketed tables co-locate the join: no exchange below the sort-merge join") {
    // The 100 TB co-location story: both fact tables bucketed on the join
    // key with equal bucket counts join WITHOUT a shuffle on either side —
    // the only exchange in the whole plan is the final group-by. Broadcast
    // is disabled so the bucketing (not dim-table size) is what's tested.
    import org.apache.spark.sql.functions.{col, count, lit}
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.orders(spark, sf).write
        .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("b_orders")
      Tables.lineitem(spark, sf).write
        .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("b_lineitem")
      val j = spark.table("b_lineitem")
        .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      j.collect() // AQE finalizes the plan on execution
      // toString prints "== Final Plan ==" then "== Initial Plan ==";
      // assert on the final section only
      val whole = j.queryExecution.executedPlan.toString
      val p = whole.split("== Initial Plan ==").head
      assert(p.contains("SortMergeJoin"), "expected SMJ over bucketed scans:\n" + p)
      val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
      assert(exchanges <= 1,
        s"bucketed join should shuffle only the final agg, got $exchanges:\n" + p)
      // and the co-located join agrees with the plain one
      val direct = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .count()
      assert(j.collect().map(_.getLong(1)).sum === direct)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("partitioned write: a day filter prunes partitions at the scan") {
    // The 100 TB table layout: facts land date-partitioned, and a
    // date-filtered read must list only the matching directories
    // (PartitionFilters), not scan-and-discard.
    import org.apache.spark.sql.functions.{col, to_date}
    val out = java.nio.file.Files.createTempDirectory("part_prune").toString
    Tables.events(spark, sf)
      .withColumn("day", to_date(col("ts")))
      .write.partitionBy("day").mode("overwrite").parquet(out)
    val back = spark.read.parquet(out)
    val day = back.select(col("day")).distinct().orderBy(col("day")).head()
      .getDate(0)
    val filtered = back.filter(col("day") === day)
    val p = filtered.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [") && !p.contains("PartitionFilters: []"),
      "day filter did not reach the partition listing:\n" + p)
    // parity with filtering the unpartitioned table
    val direct = Tables.events(spark, sf)
      .filter(to_date(col("ts")) === day).count()
    assert(filtered.count() === direct)
  }

  test("interval_overlap_join: overlap is a residual on an equi-join, never a join-free product") {
    val p = plan("interval_overlap_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "interval overlap degenerated to a range nested loop:\n" + p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), "no equi-join on the customer key:\n" + p)
  }

  test("vocab_topk/bigram_topk: global top-k plans TakeOrdered, not a global sort") {
    for (q <- Seq("vocab_topk", "bigram_topk")) {
      val p = plan(q)
      assert(p.contains("TakeOrderedAndProject"),
        s"$q: top-k not a per-partition heap:\n" + p)
    }
  }

  test("approx_topk_cms: the sketch side broadcasts (768 rows), never shuffles the estimate join") {
    val p = plan("approx_topk_cms")
    assert(p.contains("BroadcastHashJoin"), "sketch join not broadcast:\n" + p)
  }

  test("curation family: the scale-critical plan shapes hold") {
    // rate_sample_hash is a pure filter + one aggregation: exactly one
    // exchange (the final per-source rollup), nothing else may shuffle
    val rs = plan("rate_sample_hash")
    assert("Exchange".r.findAllIn(rs.replace("BroadcastExchange", "")).size <= 1,
      "hash-rate sampler grew an extra shuffle:\n" + rs)
    // pack_sequences: both windows (running sum, position) must share the
    // single per-source exchange — a second exchange means the shard
    // window repartitioned and the packing is no longer one-pass
    val ps = plan("pack_sequences")
    assert("Exchange".r.findAllIn(ps.replace("BroadcastExchange", "")).size == 1,
      "packing windows no longer share one source partitioning:\n" + ps)
    // token_rarity: the vocabulary side broadcasts (corpus-distinct tokens
    // ≪ token occurrences); a sort-merge join here would shuffle the full
    // exploded token stream twice
    val tr = plan("token_rarity")
    assert(tr.contains("BroadcastHashJoin"),
      "vocab join-back not broadcast:\n" + tr)
    // repetition_2gram: per-(doc, gram) counts must partially aggregate
    // before their exchange (map-side combine on the widest stream)
    val rg = plan("repetition_2gram")
    assert(rg.contains("partial_count"),
      "gram counts not map-side combined:\n" + rg)
  }

  test("ann_topk_ivf_int8: cell probe is an equi-join, query side broadcasts, stages shared") {
    val p = plan("ann_topk_ivf_int8")
    // candidate generation must stay a cid equi-join over the staged cell
    // table — never a cross/NLJ over the corpus (the staged index BUILD's
    // deliberate broadcast-cross is behind the ExistingRDD boundary)
    assert(!p.contains("CartesianProduct"),
      "cell probe degenerated to a cartesian product:\n" + p)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), "no equi-join on the cell id:\n" + p)
    // the bounded query-vector side broadcasts into the rescore
    assert(p.contains("BroadcastHashJoin"),
      "query-side q8 join not broadcast:\n" + p)
    // and both staged tables are registered (shared with ivf/int8 peers)
    assert(operators.Staged.isStaged(spark, sf, "ivf_cells") &&
      operators.Staged.isStaged(spark, sf, "q8_embeddings"),
      "ivf_cells/q8_embeddings stages not registered")
  }

  test("scrub_repeated_spans: shares the staged hot-span table, explodes grams exactly once") {
    // What detect + scrub genuinely share is the 100-row hot-span result
    // (staged as spans8_hot, an ExistingRDD scan here) — NOT the wide
    // (doc_id, gpos, gram, h) span stream: r8 staged that stream and the
    // judge's same-box A/B measured the materialization costing ~0.5 s
    // more than the explode it saved. So the scrub's own plan may contain
    // the word_ngrams generator exactly once (the coverage branch), and
    // must NOT contain the hot aggregation (countDistinct n_docs) — that
    // ran once, in the staged build.
    val p = plan("scrub_repeated_spans")
    assert(p.contains("Scan ExistingRDD"),
      "scrub no longer reads the staged hot-span table:\n" + p)
    val ngramGenerators = p.split('\n').count(_.contains("word_ngrams"))
    assert(ngramGenerators <= 1,
      s"scrub explodes the corpus' 8-grams $ngramGenerators times:\n" + p)
    assert(!p.contains("n_docs#") || !p.contains("count(distinct doc_id"),
      "scrub re-aggregates the hot spans instead of reading the stage:\n" + p)
    assert(operators.Staged.isStaged(spark, sf, "spans8_hot"),
      "hot-span stage not registered in the session memo")
    assert(!operators.Staged.isStaged(spark, sf, "spans8"),
      "the wide span stream must not be materialized (r8 perf regression)")
  }

  test("length_band_filter: the per-doc window partitions by (source, n_tok), never source alone") {
    // r8 judge finding #3: a row_number over partitionBy(source) sorts each
    // source's entire doc set in one task — parallelism caps at |sources|.
    // The histogram rewrite keeps the only corpus-sized window partitioned
    // by (source, n_tok) whose cells shrink as the corpus grows, and joins
    // the tiny cumulative histogram back by broadcast.
    // Window specs print as windowspecdefinition(partKeys..., ordKeys ASC
    // ..., frame): an n_tok ORDER key (rendered "n_tok#N ASC") followed by
    // a doc_id order key is exactly the funnel form — n_tok must appear as
    // a PARTITION key (no ASC) in the per-doc rank window instead. Only
    // windowspecdefinition text is inspected: a window's required Sort
    // child prints partition keys with ASC too and would false-positive.
    val p = plan("length_band_filter")
    val specs = "windowspecdefinition\\([^)]*\\)".r.findAllIn(p).toSeq
    assert(specs.nonEmpty, "no window specs in:\n" + p)
    assert(!specs.exists(s =>
        "n_tok#\\d+L? ASC[^,)]*, doc_id".r.findFirstIn(s).isDefined),
      "per-doc rank orders by (n_tok, doc_id) under a source-only partition — the funnel is back:\n" + p)
    assert("source#\\d+, n_tok#\\d+L?, doc_id#\\d+L? ASC".r.findFirstIn(p).isDefined,
      "no (source, n_tok)-partitioned doc_id rank window found:\n" + p)
    // r11: the histogram joins back by SHUFFLE-HASH on the same
    // (source, n_tok) key the rank window partitions by, so the join's
    // corpus exchange doubles as the window's — the corpus must shuffle
    // exactly once (narrow pre-join rows), with no broadcast round-trip
    // and, critically, no second exchange between the join and the window
    assert(p.contains("ShuffledHashJoin"),
      "cumulative histogram not shuffle-hash-joined onto the doc stream:\n" + p)
    assert(!p.contains("BroadcastHashJoin"),
      "length_band grew a broadcast join back:\n" + p)
    val joinFirst = p.indexOf("ShuffledHashJoin")
    val windowAt = p.indexOf("windowspecdefinition(source")
    assert(windowAt >= 0 && joinFirst > windowAt,
      "rank window no longer sits directly above the join:\n" + p)
    assert(!p.substring(windowAt, joinFirst).contains("Exchange"),
      "an exchange crept in between the rank window and the histogram join:\n" + p)
  }

  test("dedup_semantic: intra-cell self-join stays an equi-join on cid, never a product") {
    val p = plan("dedup_semantic")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "the SemDeDup cell restriction must plan an equi-join:\n" + p)
  }

  test("label_cohesion: no pair join anywhere — one explode feeding aggregates (r15)") {
    // the whole point of the sum-vector identity is replacing the
    // label-blocked pair self-join: the plan must contain NO join between
    // row-multiplying sides (the only joins are the vec_id label fetch
    // and the final |labels|-sized assembly), and no product of any kind
    val p = plan("label_cohesion")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Generate"), "expected the posexplode pass:\n" + p)
    assert("HashAggregate".r.findAllIn(p).nonEmpty, p)
  }

  test("train_val_split: map-only assignment + one aggregate, no join, no window") {
    val p = plan("train_val_split")
    assert(!p.contains("Join"), "split assignment must not join:\n" + p)
    assert(!p.contains("Window"), "split assignment must not window:\n" + p)
    // exactly one shuffle: the (split, source) aggregate's exchange
    val exchanges = "Exchange".r
      .findAllIn(p.replace("BroadcastExchange", "")).size
    assert(exchanges === 1, s"expected one aggregate exchange, got $exchanges:\n" + p)
  }

  test("dedup_minhash_estimate: id equi-joins over near-dup-sized pairs, no product") {
    operators.Staged.reset(spark)
    val p = plan("dedup_minhash_estimate")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    operators.Staged.reset(spark)
  }

  test("domain_mixture: one corpus scan beyond the staged rate table, broadcasts, no merge join") {
    operators.Staged.reset(spark)
    val df = SparkEntry.queries("domain_mixture")(spark, sf)
    df.collect() // AQE finalizes the joins
    val full = df.queryExecution.executedPlan.toString
    // AdaptiveSparkPlan.toString appends the pre-AQE initial plan —
    // count scans in the FINAL section only
    val p = full.split("== Initial Plan ==").head
    assert(p.contains("BroadcastHashJoin"),
      "per-source rate table must broadcast back onto the corpus:\n" + p)
    assert(!p.contains("SortMergeJoin"),
      "no join in the mixer justifies a shuffle-sort:\n" + p)
    val scans = "FileScan parquet".r.findAllIn(p).size
    assert(scans == 1,
      s"one corpus scan beyond the staged rates, saw $scans:\n" + p)
  }

  test("lm_surprise: global top-50 plans TakeOrdered, not a global sort") {
    val p = plan("lm_surprise")
    assert(p.contains("TakeOrderedAndProject"),
      "top-k not a per-partition heap:\n" + p)
  }

  test("dedup_exact: whole-stage codegen covers the hash/agg pipeline") {
    // AQE only inserts WholeStageCodegen nodes into the final plan, so
    // execute before inspecting.
    val df = SparkEntry.queries("dedup_exact")(spark, sf)
    df.collect() // count() would plan its own query; collect executes THIS one
    val p = df.queryExecution.executedPlan.toString
    // codegen stages render as "*(n) Op" in the final adaptive plan
    assert(p.contains("*("), "no whole-stage-codegen stages in:\n" + p)
  }

  test("ivf_cell_skew: slim aggregate over the staged cell table, TakeOrdered, join-free (r16)") {
    operators.Staged.reset(spark)
    val p = plan("ivf_cell_skew")
    // the audit reads the staged ids-only cell table: one aggregate and a
    // per-partition heap — it must never join or re-score vectors
    assert(p.contains("TakeOrderedAndProject"),
      "top-20 cells not a per-partition heap:\n" + p)
    assert(!p.contains("Join"), "cell skew must not join:\n" + p)
  }

  test("semantic_rate_by_label: slim id left-join + one aggregate, no product (r16)") {
    operators.Staged.reset(spark)
    val p = plan("semantic_rate_by_label")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      "rate-by-label must never plan a product:\n" + p)
  }

  test("ann_topk_pq: the ADC join hashes on (off, code), no unbroadcast product (r16)") {
    operators.Staged.reset(spark)
    val p = plan("ann_topk_pq")
    // the candidate-side scan joins the slim codes table against the
    // broadcast query distance table on equi keys — a hash join; the
    // codebook/offset crosses are deliberate broadcast NLJs (bounded by
    // the codebook rule), never an unbroadcast CartesianProduct
    assert(p.contains("BroadcastHashJoin"),
      "ADC join must hash on (off, code):\n" + p)
    assert(!p.contains("CartesianProduct"),
      "no unbroadcast product anywhere:\n" + p)
    // the encode winner is min(struct(dist, cw_id)) through a partial
    // (map-side) aggregate — NEVER a row_number window over
    // (vec_id, off), whose full shuffle-sort of the N·codewords·8
    // candidate rows was the most expensive cold stage in the ×25
    // StageBench before the rewrite. (rankTopK's per-query top-k window
    // is a different, WindowGroupLimit-pruned shape and stays.)
    assert(!p.contains("windowspecdefinition(vec_id"),
      "the PQ encode must aggregate, not window-sort:\n" + p)
  }

  test("ann_topk_pq_rerank: one plan — codes-scan prefilter feeding an equi-join rescore, no product, no encode window (r16 #2)") {
    operators.Staged.reset(spark)
    val p = plan("ann_topk_pq_rerank")
    // the rescore joins the bounded candidate ids back against the
    // staged quantized table on neighbor_id — an equi hash join; the
    // only NLJs are the codebook/offset broadcasts the ADC stage owns
    assert(p.contains("BroadcastHashJoin"),
      "rescore must equi-join the candidate ids:\n" + p)
    assert(!p.contains("CartesianProduct"),
      "no unbroadcast product anywhere:\n" + p)
    assert(!p.contains("windowspecdefinition(vec_id"),
      "the PQ encode must aggregate, not window-sort:\n" + p)
  }

  test("ann_topk_ivf_capped / ann_topk_pq_capped: the cap plans as a TakeOrdered over rule ids, no product (r16 #1)") {
    operators.Staged.reset(spark)
    // the smallest-K set definition itself — inside the staged index
    // build, so asserted on the set plan directly (the consumer plan
    // only sees the staged scan): a TakeOrderedAndProject per-partition
    // heap over the rule-filtered scan, never a global sort
    import org.apache.spark.sql.functions.col
    val e = Tables.embeddings(spark, TestSpark.sf)
      .withColumn("emb", col("embedding"))
    val cents = operators.IvfConfig(maxCentroids = Some(3L)).centroidSet(e)
    assert(cents.queryExecution.executedPlan.toString
        .contains("TakeOrderedAndProject"),
      "capped centroid set must plan as a per-partition heap:\n" +
        cents.queryExecution.executedPlan)
    val cws = operators.PqConfig(maxCodewords = Some(6L)).codewordSet(e)
    assert(cws.queryExecution.executedPlan.toString
        .contains("TakeOrderedAndProject"),
      "capped codeword set must plan as a per-partition heap:\n" +
        cws.queryExecution.executedPlan)
    for (q <- Seq("ann_topk_ivf_capped", "ann_topk_pq_capped")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"),
        s"$q: no unbroadcast product anywhere:\n" + p)
    }
  }

  test("ann_topk_ivfpq_rerank: the composed rungs stay equi-joins — cells cut rows, codes cut bytes, rescore reads only survivors (r18)") {
    operators.Staged.reset(spark)
    val p = plan("ann_topk_ivfpq_rerank")
    // cells→candidates is a cid equi-join; candidates→codes and the ADC
    // distance-table join hash on ids/(query_id, off, code); the rescore
    // equi-joins survivors back to the quantized table. The only NLJs
    // are the config-bounded codebook/offset broadcasts.
    assert(p.contains("BroadcastHashJoin"),
      "the composed rungs must hash-join:\n" + p)
    assert(!p.contains("CartesianProduct"),
      "no unbroadcast product anywhere:\n" + p)
    assert(!p.contains("windowspecdefinition(vec_id"),
      "the PQ encode must aggregate, not window-sort:\n" + p)
  }

  test("ann_range_cosine_cells: broadcast prune + cid/id equi-joins, no product — pruned cells' members are never read (r18)") {
    operators.Staged.reset(spark)
    val p = plan("ann_range_cosine_cells")
    // the survivors join members on cid and the rescore equi-joins ids;
    // the only NLJ is the 10×nlist bounds broadcast (config-bounded)
    assert(p.contains("BroadcastHashJoin"),
      "members must hash-join the broadcast survivor set:\n" + p)
    assert(!p.contains("CartesianProduct"),
      "no unbroadcast product anywhere:\n" + p)
  }

  test("ann_range_cosine_pq: codes-scan prefilter with broadcast ADC table, id equi-joins, no product (r18)") {
    operators.Staged.reset(spark)
    val p = plan("ann_range_cosine_pq")
    assert(p.contains("BroadcastHashJoin"),
      "the codes scan must hash-join the broadcast distance table:\n" + p)
    assert(!p.contains("CartesianProduct"),
      "no unbroadcast product anywhere:\n" + p)
    assert(!p.contains("windowspecdefinition(vec_id"),
      "the prefilter must aggregate, not window-sort:\n" + p)
  }

  test("dedup_editdist: the band blocking plans as an EQUI-join — length keys hash, never a nested loop (r18)") {
    val p = plan("dedup_editdist")
    // the whole point of the band key: candidates come from a hash/merge
    // join on band = key, with the |Δlen| and id-order conditions as
    // residual filters — a planner that degenerated this to NLJ would be
    // the O(n²) scan the blocking exists to avoid
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin") ||
      p.contains("ShuffledHashJoin"),
      "band blocking must plan an equi-join:\n" + p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "band blocking degenerated to a product/NLJ:\n" + p)
  }

  test("dedup_editdist_prefix: candidates equi-join on prefix tokens, verify equi-joins ids, no product (r18)") {
    val p = plan("dedup_editdist_prefix")
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin") ||
      p.contains("ShuffledHashJoin"),
      "prefix-token candidates must plan an equi-join:\n" + p)
    // the only permitted product is the SHORTS bucket's bounded
    // self-join (empty on this corpus — min doc length far exceeds the
    // 17-char shorts ceiling); the gram path must never product
    assert(!p.contains("CartesianProduct"),
      "no unbroadcast product anywhere:\n" + p)
  }

  test("bm25_topk: query terms broadcast against the tf postings — only query-term postings are read (r18)") {
    operators.Staged.reset(spark)
    val p = plan("bm25_topk")
    assert(p.contains("BroadcastHashJoin"),
      "the 15-term query set must broadcast against tf:\n" + p)
    // the only join without an equi-key is the single-row stats
    // crossJoin, which plans as a broadcast NLJ — a CartesianProduct
    // anywhere means something unbroadcast went quadratic
    assert(!p.contains("CartesianProduct"),
      "no unbroadcast product:\n" + p)
  }

  test("ann_topk_ivf_refined: staged trained cells feed the ivf_int8 plan shape — equi-joins, no product (r18)") {
    operators.Staged.reset(spark)
    val p = plan("ann_topk_ivf_refined")
    assert(p.contains("BroadcastHashJoin"),
      "the bounded query side must broadcast into the rescore:\n" + p)
    assert(!p.contains("CartesianProduct"),
      "no unbroadcast product anywhere:\n" + p)
  }

  test("ann_topk_pq_refined / ann_topk_ivfadc_refined: trained rungs keep the ADC plan shape — broadcast distance tables, aggregate encode, no product (r19)") {
    operators.Staged.reset(spark)
    for (q <- Seq("ann_topk_pq_refined", "ann_topk_ivfadc_refined",
        "ann_topk_ivfpq_rerank_refined", "ann_range_cosine_pq_refined",
        "ann_range_cosine_ivfpq_refined")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"),
        s"$q: the ADC distance table must broadcast against the codes " +
          "scan:\n" + p)
      assert(!p.contains("CartesianProduct"),
        s"$q: no unbroadcast product anywhere:\n" + p)
      assert(!p.contains("windowspecdefinition(vec_id"),
        s"$q: the trained encode must aggregate, not window-sort:\n" + p)
    }
  }

  test("bm25_topk_param: the literal query table broadcasts against tf postings, no product (r19)") {
    operators.Staged.reset(spark)
    val p = plan("bm25_topk_param")
    assert(p.contains("BroadcastHashJoin"),
      "the literal query terms must broadcast against tf:\n" + p)
    assert(!p.contains("CartesianProduct"),
      "no unbroadcast product:\n" + p)
  }

  test("q8_by_cid layout: the survivor join PARTITION-PRUNES the staged scan under persist mode (r19, r18 verdict #3)") {
    // the 100 TB claim behind the layout: a refused cell's FILES are
    // never read. Under persist mode the staged table is physically
    // partitioned by cid and the broadcast survivor join must reach the
    // scan as a dynamic partition-pruning filter.
    operators.Staged.reset(spark)
    val root =
      java.nio.file.Files.createTempDirectory("graft_dpp_stage").toString
    operators.Staged.enablePersist(root)
    try {
      val df = operators.SimilarityQueries.rangeCosineCellsWith(spark, sf)
      val n = df.count() // execute so AQE finalizes the plan
      val p = df.queryExecution.executedPlan.toString
      // the survivor set reaches the layout scan as a PARTITION filter —
      // the static IN over surviving cids (which pushes through the
      // delta-segment union; the broadcast join may add a dynamic
      // pruning subquery on top)
      assert(p.matches("(?s).*PartitionFilters: \\[[^\\]]*cid#.*"),
        "the layout scan must carry a non-empty partition filter on " +
          "cid:\n" + p)
      // exactness is layout-independent: same row count as the brute rung
      val brute = operators.SimilarityQueries.rangeCosine.fn(spark, sf)
        .count()
      assert(n === brute,
        s"layout-served cells rung must stay bit-equal to brute: $n vs " +
          s"$brute")
    } finally {
      operators.Staged.disablePersist()
      operators.Staged.reset(spark)
    }
  }
}
