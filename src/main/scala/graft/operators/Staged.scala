package graft.operators

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
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
  * stage) so scale factors and sessions never cross-contaminate.
  *
  * Lifecycle: entries (and their checkpointed RDDs) are dropped by
  * [[evict]] (one session), [[reset]] (alias, used by Bench between passes
  * so medians measure the operator, not a checkpoint read), or
  * automatically when the application ends (a SparkListener installed once
  * per SparkContext clears everything — checkpointed blocks die with the
  * executors anyway; the listener keeps the MAP from pinning DataFrames,
  * and with them their sessions, for the life of a long-running JVM).
  */
object Staged {
  private val memo =
    scala.collection.mutable.HashMap.empty[(SparkSession, String, String), DataFrame]
  // WeakHashMap-backed set: a context that was stopped and dropped by user
  // code must not be pinned here just to remember we once hooked it.
  private val hooked = java.util.Collections.newSetFromMap(
    new java.util.WeakHashMap[SparkContext, java.lang.Boolean]())

  // Stage builds recurse into Staged (verified → shingles), so the build runs
  // OUTSIDE the lock: a racing duplicate build is harmless (first write wins,
  // the loser's lazy checkpoint is never materialized), whereas building under
  // the lock would serialize unrelated stages and computeIfAbsent forbids the
  // reentrant stage recursion.
  def apply(spark: SparkSession, dir: String, stage: String)(
      build: => DataFrame): DataFrame = {
    val key = (spark, dir, stage)
    memo.synchronized {
      val sc = spark.sparkContext
      if (hooked.add(sc)) sc.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit =
          onAppEnd()
      })
      memo.get(key)
    } match {
      case Some(df) => df
      case None =>
        val built = build.localCheckpoint(eager = false)
        memo.synchronized(memo.getOrElseUpdate(key, built))
    }
  }

  /** Drop every staged entry belonging to `spark`, unpersisting any
    * materialized checkpoint blocks — dropping only the map entry would
    * leave the previous pass's RDD blocks in the block manager until the
    * ContextCleaner gets to them, so later bench passes would run under
    * avoidable memory pressure. Safe to call on a live session — the next
    * consumer simply rebuilds (and re-memoizes). */
  def evict(spark: SparkSession): Unit = {
    val dropped = memo.synchronized {
      val mine = memo.collect { case ((s, d, st), df) if s eq spark =>
        ((s, d, st), df) }.toList
      mine.foreach { case (k, _) => memo.remove(k) }
      mine.map(_._2)
    }
    // Unpersist OUTSIDE the lock, and the CHECKPOINTED RDD specifically:
    // localCheckpoint persists the internal RDD inside the LogicalRDD leaf
    // — df.rdd would be a freshly-derived RDD with its own id, whose
    // unpersist frees nothing.
    dropped.foreach { df =>
      // NonFatal only: a dead session means nothing to free, but an OOM or
      // interrupt must not be swallowed here (and the interrupt flag must
      // survive for whoever is shutting the bench down).
      try df.queryExecution.logical match {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.unpersist(blocking = false); ()
        case _ => ()
      } catch {
        case e: InterruptedException =>
          Thread.currentThread().interrupt(); throw e
        case scala.util.control.NonFatal(_) => ()
      }
    }
  }

  /** Bench hook: make every pass pay the stage-build cost, so per-query
    * medians report cold operator time rather than memoized reuse. */
  def reset(spark: SparkSession): Unit = evict(spark)

  private[graft] def onAppEnd(): Unit =
    memo.synchronized(memo.clear())

  private[graft] def isStaged(spark: SparkSession, dir: String,
      stage: String): Boolean =
    memo.synchronized(memo.contains((spark, dir, stage)))

  private[graft] def size: Int = memo.synchronized(memo.size)
}
