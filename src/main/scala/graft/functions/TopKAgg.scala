package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (SURVEY §2.2 UDF/UDAF row): exact top-k values per group as
  * a bounded-buffer [[Aggregator]].
  *
  * Versus the `row_number().over(window) <= k` formulation, the aggregate
  * keeps only k values per group in flight — map-side partial aggregation
  * means each shuffle partition ships at most k doubles per group instead
  * of every row, and no per-group sort of the full partition ever happens.
  * At 100 TB, top-k-per-key via window = shuffle the table + sort each
  * key's rows; via this UDAF = shuffle n_groups × k values. Semantics match
  * the window formulation exactly (duplicates retained, descending).
  */
case class TopKAgg(k: Int) extends Aggregator[Double, Seq[Double], Seq[Double]] {
  require(k > 0, s"TopKAgg: k must be positive, got $k")

  // Total order with NaN largest — the same order Spark's ORDER BY DESC
  // window uses, so the two formulations agree even on NaN inputs (the
  // primitive `v > buf.last` is false for NaN and would drop it).
  private val total = Ordering.Double.TotalOrdering

  private def trim(s: Seq[Double]): Seq[Double] =
    s.sorted(total.reverse).take(k)

  override def zero: Seq[Double] = Seq.empty

  override def reduce(buf: Seq[Double], v: Double): Seq[Double] = {
    // canonicalize -0.0 → 0.0: Spark's sort treats them EQUAL (and breaks
    // the tie arbitrarily), while TotalOrdering ranks them — emitting the
    // canonical zero is the one choice value-identical under both
    val nv = if (v == 0.0) 0.0 else v
    if (buf.size < k) trim(buf :+ nv)
    else if (total.gt(nv, buf.last)) trim(buf :+ nv)
    else buf
  }

  override def merge(a: Seq[Double], b: Seq[Double]): Seq[Double] =
    trim(a ++ b)

  override def finish(r: Seq[Double]): Seq[Double] = trim(r)

  override def bufferEncoder: Encoder[Seq[Double]] =
    ExpressionEncoder[Seq[Double]]()
  override def outputEncoder: Encoder[Seq[Double]] =
    ExpressionEncoder[Seq[Double]]()
}

object TopKAgg {
  /** Column-function form, usable in any `agg(...)`. */
  def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(TopKAgg(k), Encoders.scalaDouble)
}
