package graft

import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Diagnostic main: writes `.explain("formatted")` for named registered
  * queries to files, for the optimization-round plan deliverables
  * (plans/rNN/<query>_{before,after}.txt). Usage:
  *
  *   sbt "runMain graft.PlanDump <outDir> <suffix> [q1,q2,...]"
  *
  * Session config matches [[Bench.main]] (same master/shuffle
  * partitions/timezone), so the captured plan is the one the bench
  * executes — modulo AQE's runtime re-optimization, which explain-before-
  * execution cannot show (guide §7.2). Queries are PLANNED only, never
  * executed; staged tables referenced by a plan may trigger their builds
  * (plan resolution needs the stage's schema), which is the same
  * first-consumer semantics the bench has.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = if (args.length > 0) args(0) else "plans/r21"
    val suffix = if (args.length > 1) args(1) else "before"
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(',').map(_.trim).filter(_.nonEmpty).toSet)
      else None
    val (sfDir, cpus) = (Bench.envSfDir, Bench.envCpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    only.foreach { o =>
      val unknown = o -- SparkEntry.queries.keySet
      require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    }
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    names.foreach { case (name, fn) =>
      val plan = try {
        fn(spark, sfDir).queryExecution.explainString(ExplainMode.fromString("formatted"))
      } catch { case scala.util.control.NonFatal(e) =>
        s"PLAN FAILED: ${e.getClass.getName}: ${e.getMessage}"
      }
      Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
        plan.getBytes(StandardCharsets.UTF_8))
      println(s"PLANDUMP wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
