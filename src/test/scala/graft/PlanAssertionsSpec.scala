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

  test("dedup_exact: whole-stage codegen covers the hash/agg pipeline") {
    // AQE only inserts WholeStageCodegen nodes into the final plan, so
    // execute before inspecting.
    val df = SparkEntry.queries("dedup_exact")(spark, sf)
    df.collect() // count() would plan its own query; collect executes THIS one
    val p = df.queryExecution.executedPlan.toString
    // codegen stages render as "*(n) Op" in the final adaptive plan
    assert(p.contains("*("), "no whole-stage-codegen stages in:\n" + p)
  }
}
