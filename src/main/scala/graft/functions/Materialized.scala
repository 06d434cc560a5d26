package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Proof-of-materialization token (r13 verdict ask #6): a DataFrame whose
  * underlying blocks are PINNED — cached, or backed by a (possibly lazy)
  * localCheckpoint `LogicalRDD` — so that running a construction-time job
  * over it (the counted-gate idiom in [[TextHashing.candidatePairsFromBands]],
  * [[TextHashing.jaccardOnCandidates]] and
  * [[TextHashing.connectedComponents]]) reads blocks instead of re-driving
  * the input's lineage once at construction and again at action time.
  *
  * The contract used to be a scaladoc note enforced by ad-hoc self-pinning
  * inside each gate; this type makes it part of the signature. Wrapping is
  * the only way in: [[Materialized.apply]] either recognizes an
  * already-pinned frame (no-op) or pins it with a lazy localCheckpoint —
  * so a future caller CANNOT silently double-drive a lineage through a
  * counted gate.
  *
  * Lifecycle: frames auto-pinned here (as opposed to recognized) are
  * registered per-session and released by `Staged.evict`/`Staged.reset`
  * alongside every named stage — the same hook Bench already calls between
  * passes — and dropped on application end. Before this, the gates'
  * self-pins lived until the ContextCleaner noticed (r13 ADVICE): the same
  * memory-pressure class the connected-components eager release fixed.
  */
final class Materialized private[functions] (val df: DataFrame)

object Materialized {

  // Auto-pinned frames per session, drained by releaseAll (wired into
  // Staged.evict). List, not set: duplicates are distinct checkpoints.
  private val adopted =
    scala.collection.mutable.HashMap.empty[SparkSession, List[DataFrame]]

  /** True when `df` is already backed by pinned blocks — cached, or a
    * (possibly lazy) localCheckpoint/Staged LogicalRDD — so counting it
    * is a cached-block job, not a lineage re-drive. A BARE file relation
    * (a persisted `Staged` table read back as a parquet scan) counts as
    * materialized too: re-driving it is a plain scan of an
    * already-written table, which is exactly the contract — pinning a
    * localCheckpoint copy of it would double-store the stage in the
    * block manager for nothing (and at 100 TB you don't pin a staging
    * table in memory; you scan it). */
  def isPinned(df: DataFrame): Boolean =
    df.storageLevel != org.apache.spark.storage.StorageLevel.NONE ||
      df.queryExecution.logical
        .isInstanceOf[org.apache.spark.sql.execution.LogicalRDD] ||
      isBareRelation(df.queryExecution.analyzed)

  /** A leaf relation (optionally alias-wrapped): a scan of stored data,
    * nothing derived on top. Deliberately conservative — a Project or
    * Filter above the scan means derivation whose double-drive cost this
    * type exists to prevent. */
  private def isBareRelation(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean =
    plan match {
      case a: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias =>
        isBareRelation(a.child)
      case _: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        true
      case r if r.getClass.getSimpleName == "DataSourceV2Relation" => true
      case _ => false
    }

  /** Wrap `df` as materialized: a no-op for already-pinned frames; anything
    * else gets a LAZY localCheckpoint (the gate's construction-time job is
    * the action that fills it) which is registered for release by
    * `Staged.evict`/`reset`. */
  def apply(df: DataFrame): Materialized =
    if (isPinned(df)) new Materialized(df)
    else new Materialized(adopt(df.localCheckpoint(eager = false)))

  /** Register an ALREADY-pinned frame for release by `Staged.evict` —
    * used for gate-internal checkpoints that outlive the call (the
    * symmetrized CC edge table, the final CC label table a returned plan
    * references) so they share the Staged lifecycle instead of waiting on
    * the ContextCleaner. */
  private[graft] def adopt(df: DataFrame): DataFrame = {
    adopted.synchronized {
      adopted(df.sparkSession) = df :: adopted.getOrElse(df.sparkSession, Nil)
    }
    df
  }

  /** Unpersist every frame auto-pinned for `spark` (called by
    * `Staged.evict`; safe on a live session — a later gate call simply
    * re-pins). Plans returned by the gates share the Staged lifecycle:
    * they are built, consumed, and not reused across an evict. */
  private[graft] def releaseAll(spark: SparkSession): Unit = {
    val mine = adopted.synchronized(adopted.remove(spark)).getOrElse(Nil)
    mine.foreach(unpersistCheckpoint)
  }

  private[graft] def clearAll(): Unit =
    adopted.synchronized(adopted.clear())

  private[graft] def adoptedCount(spark: SparkSession): Int =
    adopted.synchronized(adopted.getOrElse(spark, Nil).size)

  /** Unpersist the CHECKPOINTED RDD inside a localCheckpoint frame —
    * `df.rdd` would be a freshly-derived RDD whose unpersist frees
    * nothing (same targeting as Staged.evict / connectedComponents'
    * eager release). */
  private[graft] def unpersistCheckpoint(df: DataFrame): Unit =
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
