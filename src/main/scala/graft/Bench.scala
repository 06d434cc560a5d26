package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Session warmup (codegen compiler, shuffle machinery, broadcast +
    // window execs, parquet footers) so the first timed query measures
    // itself, not JVM startup; queries run in sorted name order for
    // cross-round comparability.
    try {
      import org.apache.spark.sql.functions._
      spark.read.parquet(s"$sfDir/lineitem.parquet").count()
      val r = spark.range(1000).select(col("id"), (col("id") % 7).as("k"))
      r.groupBy(col("k")).agg(sum(col("id")).as("s"))       // shuffle agg
        .join(broadcast(r.limit(14)), Seq("k"), "left")     // broadcast join
        .withColumn("rn", row_number().over(                // window exec
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("k")).orderBy(col("s"))))
        .count()
    } catch { case _: Throwable => () }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // Stop Spark BEFORE printing so no executor/log output can interleave
    // with (or trail) the one JSON line the driver parses.
    spark.stop()
    println(line)
    System.out.flush()
  }
}
