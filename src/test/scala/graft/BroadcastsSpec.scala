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

  test("default gate follows spark.sql.autoBroadcastJoinThreshold; -1 falls back to 64 MB") {
    val dim = Tables.customer(spark, sf)
    val fact = Tables.orders(spark, sf)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // a deployment tightening the Spark threshold tightens this gate too
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1b")
      assert(Broadcasts.effectiveMaxBytes(dim) === 1L)
      val tightened = fact.join(Broadcasts.broadcastIfSmall(dim),
        fact("o_custkey") === dim("c_custkey"))
      assert(!hinted(tightened),
        "a 1-byte session threshold must drop the hint on an sf-scale dim")
      // disabling auto-broadcast (-1) falls back to the 64 MB default:
      // manual hints are exactly the control a -1 deployment wants
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      assert(Broadcasts.effectiveMaxBytes(dim) === Broadcasts.DefaultMaxBytes)
      val fallback = fact.join(Broadcasts.broadcastIfSmall(dim),
        fact("o_custkey") === dim("c_custkey"))
      assert(hinted(fallback),
        "-1 must fall back to the 64 MB gate, not drop every hint")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}
