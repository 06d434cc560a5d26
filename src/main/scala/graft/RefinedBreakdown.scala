package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** r22 diagnostic (kept tooling, like [[EditBreakdown]]): time each staged
  * component of the trained/refined ANN family in isolation and count the
  * Spark jobs each one drives. At sf0.1 the refined rungs run on 2,000
  * vectors, so their seconds are almost pure FIXED cost — job count ×
  * scheduling/planning overhead — which is what this main attributes. */
object RefinedBreakdown {
  def main(args: Array[String]): Unit = {
    val (sfDir, cpus) = (Bench.envSfDir, Bench.envCpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    import operators.{SimilarityQueries => SQ, Staged}
    def t[A](name: String)(f: => A): A = {
      spark.sparkContext.setJobDescription(name)
      val j0 = jobs.get()
      val t0 = System.nanoTime(); val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"TIMER $name $dt%.3f s jobs=${jobs.get() - j0}")
      r
    }
    (1 to 3).foreach { pass =>
      println(s"--- pass $pass ---")
      Staged.reset(spark)
      t("normed")(SQ.normed(spark, sfDir).count())
      t("quantized")(SQ.quantized(spark, sfDir).count())
      t("ivf_cells (rule)")(SQ.ivfCells(spark, sfDir).count())
      t("refined centroids (lloyd x2)")(
        SQ.refinedCentroids(spark, sfDir).count())
      t("refined cells")(SQ.refinedCells(spark, sfDir).count())
      t("q8_by_cid_refined")(SQ.q8ByCidRefined(spark, sfDir).count())
      t("range live cells refined")(
        SQ.rangeLiveCellsRefined(spark, sfDir).count())
      t("q ann_range_cosine_cells_refined")(
        SQ.rangeCosineCellsRefined.fn(spark, sfDir).count())
      t("pq refined codebook (lloyd x2)")(
        SQ.pqRefinedCodebook(spark, sfDir).count())
      t("pq refined codes")(SQ.pqRefinedCodes(spark, sfDir).count())
      t("pq refined residuals")(SQ.pqRefinedResiduals(spark, sfDir).count())
      t("q ann_range_cosine_ivfpq_refined")(
        SQ.rangeCosineComposedRefined.fn(spark, sfDir).count())
      t("q ann_range_cosine_pq_refined")(
        SQ.rangeCosinePqRefined.fn(spark, sfDir).count())
      t("q ann_topk_ivfadc_refined")(
        SQ.ivfAdcRefinedTopK.fn(spark, sfDir).count())
      t("q ann_range_cosine_cells")(
        SQ.rangeCosineCells.fn(spark, sfDir).count())
      t("q ann_range_cosine_ivfpq")(
        SQ.rangeCosineComposed.fn(spark, sfDir).count())
    }
    spark.stop()
  }
}
