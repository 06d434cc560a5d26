package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped materialized intermediates shared across queries.
  *
  * Several operator families are staged pipelines whose stage outputs feed
  * multiple downstream consumers (near-dup: signatures → candidates →
  * verified pairs → components; ANN: normalized embeddings → three index
  * variants). At 100 TB each stage is a persisted staging table — you never
  * re-shingle a corpus to verify candidates you already generated, and you
  * never re-normalize embeddings per index. This memo is the single-session
  * analogue: the first consumer materializes the stage via localCheckpoint,
  * later consumers reuse the materialized RDD. Keyed by (session, data dir,
  * stage) so scale factors and sessions never cross-contaminate. */
object Staged {
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  def apply(spark: SparkSession, dir: String, stage: String)(
      build: => DataFrame): DataFrame =
    memo.computeIfAbsent((spark, dir, stage),
      _ => build.localCheckpoint(eager = false))
}
