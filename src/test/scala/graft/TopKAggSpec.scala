package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The typed top-k UDAF's contract: agrees with the
  * `row_number().over(window) <= k` formulation on every input — including
  * NaN (TotalOrdering ranks it largest, like ORDER BY DESC) and signed
  * zeros (the aggregate canonicalizes -0.0 → 0.0, which is the one choice
  * value-identical under both orderings), with duplicates retained. */
class TopKAggSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val k = 3

  private def agree(a: Double, b: Double): Boolean =
    (a == b) || (a.isNaN && b.isNaN)

  test("matches the window formulation on NaN, signed zeros, and duplicates") {
    val data = Seq(
      ("a", 1.0), ("a", Double.NaN), ("a", 5.0), ("a", 5.0), ("a", -3.0),
      ("b", -0.0), ("b", 0.0), ("b", -1.0), ("b", -0.0), ("b", -2.0),
      ("c", 2.0))
    val df = data.toDF("key", "v")

    val viaAgg = df.groupBy($"key")
      .agg(functions.TopKAgg.topK(k)($"v").as("topk"))
      .as[(String, Seq[Double])].collect().toMap

    val w = Window.partitionBy($"key").orderBy($"v".desc)
    val viaWindow = df.withColumn("rn", row_number().over(w))
      .filter($"rn" <= k)
      .orderBy($"key", $"rn")
      .as[(String, Double, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap

    assert(viaAgg.keySet === viaWindow.keySet)
    for (key <- viaAgg.keySet) {
      val (a, b) = (viaAgg(key), viaWindow(key))
      assert(a.size === b.size, s"$key: $a vs $b")
      assert(a.zip(b).forall { case (x, y) => agree(x, y) },
        s"$key: $a vs $b")
    }
    // the signed-zero group's top-3 is all zeros (two -0.0 + one 0.0),
    // emitted as the canonical zero, never -0.0
    assert(viaAgg("b").count(v => v == 0.0) === 3)
    assert(viaAgg("b").forall(v =>
      java.lang.Double.doubleToRawLongBits(v) !=
        java.lang.Double.doubleToRawLongBits(-0.0)))
    // NaN ranks largest, duplicates retained
    assert(viaAgg("a").head.isNaN)
    assert(viaAgg("a").drop(1) === Seq(5.0, 5.0))
  }
}
