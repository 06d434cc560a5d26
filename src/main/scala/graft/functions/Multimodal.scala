package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}

/** Multimodal column handling (SURVEY.md §2.3): media as opaque binary
  * payloads with typed metadata, processed in distributed batches.
  *
  * The actual codec step is STUBBED — this container has no image/audio
  * libraries — behind [[MediaDecoder]]; `FakeDecoder` is the deterministic
  * stand-in used by tests. Everything Spark-side is real: the schema, the
  * binary column handling, the per-partition batch shape (one decoder
  * instance per partition, reused across rows — the same shape a JNI or
  * Arrow-batched decoder needs), and the partitioning story (payloads stay
  * where they are; only metadata shuffles).
  */
object Multimodal {

  /** A media row: opaque payload + envelope metadata. */
  final case class MediaRow(media_id: Long, kind: String,
      payload: Array[Byte])

  /** Decoded (or probed) metadata for one media payload. */
  final case class MediaMeta(media_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int, ok: Boolean)

  /** The pluggable decode boundary. A real implementation wraps a codec
    * library; it is instantiated once per partition (expensive init
    * amortized across the batch). */
  trait MediaDecoder extends Serializable {
    def probe(payload: Array[Byte]): (Int, Int, Int)
  }

  /** Deterministic fake decoder: derives plausible dimensions from payload
    * length — keeps the pipeline testable and reproducible offline. */
  object FakeDecoder extends MediaDecoder {
    def probe(payload: Array[Byte]): (Int, Int, Int) = {
      val n = payload.length
      (16 + n % 64, 16 + (n / 64) % 64, 1 + n % 4)
    }
  }

  /** Distributed decode: one decoder per partition, streaming over rows —
    * no payload ever moves to the driver, and the output carries only
    * metadata (bytes dropped as early as possible, which is what keeps the
    * shuffle small at 100 TB). */
  def probeAll(media: Dataset[MediaRow],
      decoder: MediaDecoder = FakeDecoder): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, f) = decoder.probe(r.payload)
        MediaMeta(r.media_id, r.kind, r.payload.length.toLong, w, h, f,
          ok = r.payload.nonEmpty)
      }
    }
  }

  /** Lift the documents table into a media table (payload = utf-8 bytes) —
    * the test harness for the plumbing above. */
  def documentsAsMedia(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.selectExpr("doc_id AS media_id", "'text' AS kind",
      "CAST(text AS BINARY) AS payload").as[MediaRow]
  }
}
