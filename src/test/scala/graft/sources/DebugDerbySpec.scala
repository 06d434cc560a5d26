package graft.sources
import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
class DebugDerbySpec extends AnyFunSuite {
  test("derby probe debug 2") {
    val url = "jdbc:derby:memory:dbgprobe2;create=true"
    import TestSpark.spark
    import spark.implicits._
    val df = Seq((1, "a")).toDF("x", "y")
    df.write.mode("append").jdbc(url, "trades", new java.util.Properties)
    val c = java.sql.DriverManager.getConnection(url)
    val md = c.getMetaData
    for (s <- Seq(null, "APP"); p <- Seq("trades", "TRADES", "\"trades\"")) {
      val rs = md.getTables(null, s, p, null)
      println(s"PROBE schema=$s name=$p -> ${rs.next()}")
      rs.close()
    }
    val rs2 = md.getTables(null, null, "%", null)
    while (rs2.next()) println("TABLE: [" + rs2.getString(2) + "].[" + rs2.getString(3) + "]")
    c.close()
  }
}
