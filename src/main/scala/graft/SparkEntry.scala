package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All operators live in `graft.operators.*` as [[QueryDef]]s; this object
  * only aggregates them into the driver's expected shape.
  */
object SparkEntry {

  /** The full operator registry (SURVEY.md §2 inventory). */
  def registry: Seq[QueryDef] =
    operators.CoreQueries.defs ++
      operators.RefOpQueries.defs ++
      operators.DerivedQueries.defs ++
      operators.SqlSurfaceQueries.defs ++
      operators.AnalyticsQueries.defs ++
      operators.TpchMoreQueries.defs ++
      operators.TpchFinalQueries.defs ++
      operators.ShapeQueries.defs ++
      operators.DedupQueries.defs ++
      operators.VocabQueries.defs ++
      operators.SimilarityQueries.defs ++
      operators.TextQueries.defs ++
      operators.MultimodalQueries.defs ++
      operators.CurationQueries.defs ++
      operators.ReplayBench.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Gap detection — the reference's core completeness check
    * (real_guac_async.py:123-132) as a lag-window batch query. */
  def entry(spark: SparkSession): DataFrame =
    operators.CoreQueries.gapDetect.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
