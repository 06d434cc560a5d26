package graft.streaming

/** Checkpoint-compatibility boundaries as CODE (r13 verdict ask #7).
  *
  * SURVEY §5.3 records the engine's streaming state-schema history — the
  * r7 trade-dedup key widening, the r8 value-only surrogate change, the
  * r9 banding-scheme key prefix — as prose. These constants pin each
  * stateful operator's CURRENT schema version, and the operators build
  * their key schemas from the single definitions here, so a refactor that
  * changes a state schema has to touch this file (the version bump makes
  * the compatibility break visible in the diff instead of silently
  * stranding deployed checkpoints). The enforcement mechanism at restore
  * time is Spark's own state-store schema check; `StateSchemaSpec` pins
  * that the refusal is LOUD — a stream restarted across an incompatible
  * schema fails its first batch rather than run with corrupt state.
  *
  * Upgrade playbook for a version bump (§5.3): restart from a fresh
  * checkpoint and replay the WAL — the frame WAL makes that lossless. */
object StateSchemas {

  /** Trade dedup key — `Watermarked.dedupTrades` (streaming,
    * dropDuplicatesWithinWatermark) and `Pipeline.dedupTradeIds`
    * (per-batch): ONE definition so the streaming and batch layouts can
    * never drift apart.
    *
    * v2 since r7: (exchange, tradeId) → (exchange, productId, tradeId,
    * __idless_key) — pre-r7 checkpoints do not restore. The r8 change
    * (surrogate VALUE adds unix_micros(exchangeTs)) left the schema —
    * and this version — unchanged: old checkpoints restore, with the
    * documented one-time horizon-bounded id-less re-admit window. */
  val TradeDedupKeyVersion: Int = 2
  val TradeDedupKey: Seq[String] =
    Seq("exchange", "productId", "tradeId", "__idless_key")

  /** Near-dup bucket registry key (`CurationStream`'s bucket stage).
    * v2 since r9: the bucket key PREFIXES the banding scheme, so a
    * restart with different banding parameters probes a disjoint
    * keyspace (old entries evict within one horizon) instead of silently
    * half-matching. `horizonMs` stays OUT of the key by design — it
    * shifts eviction timing, never matching semantics. */
  val NearDupBucketKeyVersion: Int = 2
  def nearDupBucketPrefix(bands: Int, rowsPerBand: Int): String =
    s"$bands:$rowsPerBand"

  /** Book replay state (`BookEngine`'s ReplayState on both the
    * flatMapGroupsWithState and transformWithState paths). v1 — never
    * broken since introduction. */
  val BookReplayStateVersion: Int = 1

  /** Canonical-assignment chain state (`CurationStream`'s Keeper /
    * cluster / CanonState value states). v1 — never broken since
    * introduction. */
  val CurationCanonicalStateVersion: Int = 1

  /** Semantic-gate cell registry key (`CurationStream.semDedupGate`).
    * v1 (r16). The key prefixes a digest of the FROZEN centroid id set —
    * the same discipline as the banding-scheme prefix above: a restart
    * under a re-founded quantizer (drift refusal, IvfConfig change)
    * probes a disjoint keyspace instead of comparing vectors that were
    * cell-mates only under the OLD cells; stale entries evict via their
    * event-time timers within a horizon. `horizonMs`/`dotFloor` stay out
    * of the key — they shift verdicts, not key identity (same reasoning
    * as horizonMs above). r17's `semDedupGateCoded` (streamed PQ codes)
    * and r18's `cbDigest` verdict column leave the STATE schema — and
    * this version — unchanged: codes and digest ride the operator's
    * input/output rows only, never the keeper registry, so existing
    * checkpoints restore under either gate variant — pinned by
    * SemDedupGateSpec's cross-shape restore (a checkpoint written by a
    * replica of the PRE-codes probe shape restores under today's gate,
    * with the pre-restart keepers still deciding). */
  val SemGateCellKeyVersion: Int = 1
  /** Delegates to the ONE id-set digest the frozen-family stage keys
    * use — shared code, so the stream's keyspace cannot drift from the
    * staged family's names on a re-founding. */
  def semGateCellPrefix(centroidIds: Seq[Long]): String =
    graft.operators.SimilarityQueries.idSetDigest(centroidIds)

  /** Keyspace prefix for the TRAINED gate (r18): the trained table's
    * VALUE digest, 't'-tagged so it can never collide with a rule
    * lineage's id digest of the same hex — a re-TRAINING keeps the seed
    * ids but moves the values, so an id digest would silently leave two
    * trainings' keepers comparable. Same digest definition (and VALUE)
    * as the trained family's `+frz` stage-key component. */
  def semGateTrainedCellPrefix(valueDigest: String): String =
    "t" + valueDigest
}
