package graft

import graft.functions.VectorExprs
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** vec_dot — the custom codegen Catalyst expression behind the similarity
  * family. Checks numeric agreement with the built-in higher-order fold
  * (same left-to-right accumulation ⇒ bit-identical doubles), null
  * semantics, and type checking. */
class VectorExprsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  VectorExprs.register(spark)

  test("vec_dot matches the interpreted zip_with/aggregate fold bit-for-bit") {
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.1, -0.2, 0.3), Array(-7.0, 0.25, 1e-3)),
      (Array.fill(64)(0.123), Array.fill(64)(-0.456))
    ).toDF("a", "b")
    val out = df.select(
      expr("vec_dot(a, b)").as("fast"),
      expr("""aggregate(zip_with(a, b, (x, y) -> x * y),
              CAST(0 AS DOUBLE), (acc, v) -> acc + v)""").as("ref"))
      .collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("vec_dot: null input, null element, and length mismatch all yield NULL") {
    // the same cases where the aggregate(zip_with) formulation yields NULL
    // — truncating or reading a null slot as 0.0 would be a wrong NUMBER
    val r1 = spark.sql(
      "SELECT vec_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D))")
      .collect().head
    assert(r1.isNullAt(0))
    val r2 = spark.sql(
      "SELECT vec_dot(array(1.0D, 2.0D, 99.0D), array(10.0D, 20.0D))")
      .collect().head
    assert(r2.isNullAt(0), "length mismatch must be NULL, not a truncated fold")
    val r3 = spark.sql(
      "SELECT vec_dot(array(1.0D, CAST(NULL AS DOUBLE)), array(10.0D, 20.0D))")
      .collect().head
    assert(r3.isNullAt(0), "a null element must be NULL, not read as 0.0")
  }

  test("vec_dot rejects non-double-array inputs at analysis") {
    val err = intercept[Exception] {
      spark.sql("SELECT vec_dot('x', array(1.0D))").collect()
    }
    assert(err.getMessage.toLowerCase.contains("vec_dot") ||
      err.getMessage.toLowerCase.contains("data type"))
  }
}
