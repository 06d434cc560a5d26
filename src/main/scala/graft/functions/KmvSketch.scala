package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** k-minimum-values distinct-count sketch as a typed [[Aggregator]] — the
  * engine's UDAF surface (SURVEY §2.2 UDF/UDAF row), and the shape that
  * actually scales: the buffer is the k smallest DISTINCT hash values, so
  * map-side partial aggregation moves at most k longs per (partition,
  * group) — the window-ranked SQL formulation this replaced shuffled every
  * distinct hash of every group before discarding all but k.
  *
  * The state is a sorted, deduplicated Array[Long] capped at k: reduce is
  * a binary search + bounded insert, merge is a bounded sorted-merge —
  * both associative and commutative, so partial buffers combine in any
  * shuffle order to the same sketch. Estimate: with the k-th smallest of n
  * uniform hashes at normalized position h/2^32 ≈ k/D, the distinct count
  * D ≈ (k-1) / (h_k / 2^32) (classic KMV, Beyer et al.); below k distinct
  * values the sketch is exact. Inputs are md5-derived 32-bit hashes, so
  * the whole estimate is deterministic integer/double arithmetic that a
  * DuckDB oracle reproduces bit-for-bit.
  */
class KmvSketch(k: Int)
    extends Aggregator[Long, Array[Long], (Long, Long)] {
  require(k >= 2, "KMV needs k >= 2")

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    val i = java.util.Arrays.binarySearch(buf, h)
    if (i >= 0) buf // already present
    else {
      val at = -i - 1
      if (buf.length >= k && at >= k) buf // not among the k smallest
      else {
        val n = math.min(buf.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(buf, 0, out, 0, at)
        out(at) = h
        System.arraycopy(buf, at, out, at + 1, n - at - 1)
        out
      }
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var o = 0
    while (o < out.length && (i < a.length || j < b.length)) {
      val take =
        if (j >= b.length) { i += 1; a(i - 1) }
        else if (i >= a.length) { j += 1; b(j - 1) }
        else if (a(i) < b(j)) { i += 1; a(i - 1) }
        else if (b(j) < a(i)) { j += 1; b(j - 1) }
        else { i += 1; j += 1; a(i - 1) } // equal: dedup
      out(o) = take
      o += 1
    }
    if (o == out.length) out else java.util.Arrays.copyOf(out, o)
  }

  /** (k_used, h_k) — the estimate itself is one projection away, kept out
    * of the sketch so callers can also merge/inspect raw sketches. */
  override def finish(buf: Array[Long]): (Long, Long) =
    (buf.length.toLong, if (buf.isEmpty) 0L else buf.last)

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
}
