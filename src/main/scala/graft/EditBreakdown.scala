package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** KEPT r21/r22 diagnostic tooling (see OPTIMIZATION_r22.md "Tooling"):
  * times each component of the edit-distance family's staged build in
  * isolation. Not part of any query path. */
object EditBreakdown {
  def main(args: Array[String]): Unit = {
    val (sfDir, cpus) = (Bench.envSfDir, Bench.envCpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/documents.parquet").count()
    import operators.{DedupQueries => DQ, Staged}
    def t[A](name: String)(f: => A): A = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime(); val r = f
      println(f"TIMER $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val cfg = DQ.EditConfig.Default
    (1 to 3).foreach { pass =>
      println(s"--- pass $pass ---")
      Staged.reset(spark)
      t("classes stage")(DQ.editClassesStage(spark, sfDir).count())
      t("cgrams stage")(DQ.classGrams(spark, sfDir, cfg).count())
      t("corder stage")(DQ.classGramOrderFrozen(spark, sfDir, cfg).count())
      t("cprefix stage (incl digest)")(
        DQ.classPrefixFrozen(spark, sfDir, cfg).count())
      t("cand intersection")(DQ.editPairCandidates(spark, sfDir, cfg).count())
      t("pairs stage (verify)")(
        DQ.editBandPairsStage(spark, sfDir, cfg).count())
      t("q dedup_editdist (expansion)")(
        DQ.editDistPairs.fn(spark, sfDir).count())
      t("q dedup_editdist_collapsed")(
        DQ.editDistCollapsed.fn(spark, sfDir).count())
      t("q dedup_editdist_k4")(DQ.editDistK4.fn(spark, sfDir).count())
      t("doc grams stage")(DQ.editGrams(spark, sfDir, cfg).count())
      t("doc freq stage")(DQ.editGramFreq(spark, sfDir, cfg).count())
      t("doc prefix stage")(DQ.editPrefix(spark, sfDir, cfg).count())
      t("doc prefix candidates")(
        DQ.editDistPrefixCandidates(spark, sfDir, cfg).count())
      t("q dedup_editdist_prefix (lookup)")(
        DQ.editDistPrefix.fn(spark, sfDir).count())
    }
    spark.stop()
  }
}
