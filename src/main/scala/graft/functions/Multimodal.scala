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

  /** One sampled frame of a media payload. */
  final case class MediaFrame(media_id: Long, frame_no: Int,
      payload: Array[Byte])

  /** One extracted feature vector (the bridge into the ANN family — these
    * rows feed the same vec_dot/LSH/IVF search paths as the embeddings
    * table). */
  final case class MediaFeature(media_id: Long, embedding: Array[Double])

  /** Resize: payload → transformed payload with new dimensions. STUB
    * transform (deterministic byte fold to the target size); real plumbing:
    * partition-local, 1→1, output carries the transformed payload so a
    * downstream sink can write the derived asset next to the original. */
  def resize(media: Dataset[MediaRow], width: Int, height: Int,
      decoder: MediaDecoder = FakeDecoder): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    require(width > 0 && height > 0,
      s"resize: dimensions must be positive, got ${width}x$height")
    val target = math.multiplyExact(width, height) // overflow → loud, not 0
    media.mapPartitions { rows =>
      rows.map { r =>
        val out = new Array[Byte](target)
        var i = 0
        while (i < out.length) {
          out(i) = if (r.payload.isEmpty) 0
            else r.payload(i % r.payload.length)
          i += 1
        }
        MediaRow(r.media_id, r.kind, out)
      }
    }
  }

  /** Frame sampling: one media row → every `stride`-th frame (1→N flatMap
    * shape). STUB framing (fixed-size payload chunks); real plumbing: the
    * explode happens on executors, frames inherit the row's partition, and
    * the output is bounded by n_frames/stride — the knob that makes video
    * corpora tractable. */
  def frameSample(media: Dataset[MediaRow], stride: Int,
      frameBytes: Int = 64): Dataset[MediaFrame] = {
    import media.sparkSession.implicits._
    require(stride > 0, "stride must be positive")
    media.flatMap { r =>
      r.payload.grouped(frameBytes).zipWithIndex.collect {
        case (chunk, i) if i % stride == 0 => MediaFrame(r.media_id, i, chunk)
      }
    }
  }

  /** The shared byte-sum fold both feature paths run — ONE definition, so
    * the normalized and raw variants can never silently diverge. */
  private def byteSums(payload: Array[Byte], dim: Int): Array[Double] = {
    val v = new Array[Double](dim)
    var i = 0
    while (i < payload.length) {
      v(i % dim) += (payload(i) & 0xff)
      i += 1
    }
    v
  }

  /** Feature extraction: payload → fixed-dim embedding. STUB features
    * (dim d = sum of byte values at positions ≡ d mod dim, L2-normalized)
    * — deterministic AND oracle-expressible: the per-dim sums are exact
    * integers, their squares sum exactly in doubles, so the normalized
    * vector is bit-identical to the DuckDB formulation in
    * MultimodalQueries. Real plumbing: one "model" per partition, output
    * is ARRAY<DOUBLE> ready for the vec_dot / LSH / IVF similarity
    * operators. */
  def features(media: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition "model init" happens here (amortized across rows)
      rows.map { r =>
        val v = byteSums(r.payload, dim)
        val norm = math.sqrt(v.map(x => x * x).sum)
        MediaFeature(r.media_id,
          if (norm == 0) v else v.map(_ / norm))
      }
    }
  }

  /** As [[features]] but WITHOUT normalization: the per-dim byte sums as
    * integral doubles. Every value (and every pairwise dot product) stays
    * far below 2^53, so downstream arithmetic is exact — the composed
    * multimodal→ANN query ranks by these with zero float-ordering risk. */
  def featuresRaw(media: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map(r => MediaFeature(r.media_id, byteSums(r.payload, dim)))
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
