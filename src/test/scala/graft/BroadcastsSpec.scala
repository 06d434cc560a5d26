package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Broadcasts

/** The broadcast-audit gate (r11 verdict ask #2): below the byte
  * threshold the hint is applied (plan identical to the forced form);
  * above it the hint is absent and strategy choice is left to runtime. */
class BroadcastsSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private def hinted(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.toString.contains("strategy=broadcast")

  test("broadcastIfSmall applies the hint under the threshold, drops it past") {
    val dim = Tables.customer(spark, sf)
    val fact = Tables.orders(spark, sf)
    val under = fact.join(Broadcasts.broadcastIfSmall(dim),
      fact("o_custkey") === dim("c_custkey"))
    assert(hinted(under), "sf-scale dim must still carry the hint")
    val over = fact.join(
      Broadcasts.broadcastIfSmall(Tables.customer(spark, sf), maxBytes = 1L),
      col("o_custkey") === col("c_custkey"))
    assert(!hinted(over), "a dim past the byte gate must not be hinted")
  }

  test("broadcastSizedBy gates the composite on the base's scan stats") {
    val supp = Tables.supplier(spark, sf)
    val nat = Tables.nation(spark, sf)
    val composite = supp.join(nat,
      supp("s_nationkey") === nat("n_nationkey"))
    val under = Broadcasts.broadcastSizedBy(composite, supp)
    assert(hinted(under.join(Tables.lineitem(spark, sf),
      col("s_suppkey") === col("l_suppkey"))))
    val over = Broadcasts.broadcastSizedBy(composite, supp, maxBytes = 1L)
    assert(!hinted(over.join(Tables.lineitem(spark, sf),
      col("s_suppkey") === col("l_suppkey"))))
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}
