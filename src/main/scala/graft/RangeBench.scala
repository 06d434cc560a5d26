package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures what the exact range query's cell bound buys (r18) — the
  * GuardBench discipline applied to [[operators.SimilarityQueries
  * .rangeCosineCellsWith]]: wall-clock on an ENGINEERED corpus where the
  * prune CAN fire, against the brute rung on the same corpus, with the
  * result-set identity REQUIRED (a pruned run that dropped one pair
  * aborts the bench).
  *
  * Corpus: `SPARK_GRAFT_RANGE_N` vectors in 63 tight clusters
  * (deterministic xxhash64 arithmetic — base direction per `id % 63`,
  * ±1 integer jitter per (id, dim); the deduplicated/clustered shape
  * real embedding corpora have). 63 is coprime with the centroid
  * stride 100, so `IvfConfig(maxCentroids = 63)`'s smallest-63 rule
  * ids (7, 107, …, 6207) land EXACTLY one per cluster — the capped
  * quantizer is cluster-aligned by arithmetic, not luck, and every
  * cell's radius is jitter-sized (rr ≤ 256) while cross-cluster
  * centroid dots sit far below the floor. Floor 50,000 ≈ one third of
  * the within-cluster dot (~136k), far above cross-cluster noise
  * (σ ≈ 17k): each query's matches are exactly its own cluster, so the
  * bound should refuse ~62/63 of the corpus per query.
  *
  * r19 (r18 verdict ask #3): the bench runs in PERSIST MODE, so the
  * registered cells query itself serves from the FIRST-CLASS staged
  * cid-partitioned layout ([[operators.SimilarityQueries.q8ByCid]]) —
  * the survivor join is dynamic partition pruning at the scan, and the
  * r18 hand-written `partitionBy(cid)` bench copy is gone. The
  * historical UNPARTITIONED in-place plan is kept as the bench-local
  * CONTROL (`cells_sec`), preserving the honest lesson: without the
  * layout the survivor filter pays a corpus-wide id-join shuffle.
  *
  * Timed with the staged index WARM (cells + radii + layout built
  * before the first pass — the deployment shape: found once, queried
  * many); the founding cost is printed separately, not hidden. Prints
  * one JSON line. Run: `sbt "runMain graft.RangeBench"`; env:
  * SPARK_GRAFT_RANGE_N (default 201,600), SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_BENCH_PASSES. */
object RangeBench {
  def main(args: Array[String]): Unit = {
    val n = math.max(6300L, sys.env.get("SPARK_GRAFT_RANGE_N")
      .flatMap(_.toLongOption).getOrElse(201600L))
    val passes = Bench.envPasses
    val spark = SparkSession.builder()
      .master(s"local[${Bench.envCpus}]")
      .config("spark.sql.shuffle.partitions", Bench.envCpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val calibSec =
      try Bench.calibrationProbe(spark)
      catch { case scala.util.control.NonFatal(_) => -1.0 }

    val dir = s"/tmp/graft_rangebench_n$n"
    val marker = new java.io.File(s"$dir/_RANGEBENCH_OK")
    if (!marker.exists()) {
      val emb = expr(
        """transform(sequence(0, 63), d -> CAST(
          |  ((pmod(xxhash64('rc', id % 63, d), 161) - 80) +
          |   (pmod(xxhash64('rj', id, d), 3) - 1)) / 64.0
          |  AS FLOAT))""".stripMargin)
      spark.range(n)
        .select(col("id").as("vec_id"), emb.as("embedding"),
          (col("id") % 10).cast("int").as("label"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      marker.getParentFile.mkdirs()
      java.nio.file.Files.write(marker.toPath,
        "ok".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      ()
    }

    // persist mode: the deployment shape — stages (incl. the
    // cid-partitioned layout) are parquet tables on disk, scans prune.
    // The stage root sits OUTSIDE the corpus dir: the corpus
    // fingerprint walks the input listing, and a stage root inside it
    // would invalidate every stage on its own publish.
    val stageRoot = s"${dir}_stage"
    operators.Staged.enablePersist(stageRoot)

    val cfg = operators.IvfConfig(maxCentroids = Some(63L))
    val floor = lit(50000L)
    // found the index OUTSIDE the timed region (the deployment shape),
    // but print what founding cost — never hide an index build
    operators.Staged.reset(spark)
    val t0 = System.nanoTime()
    val nlist = operators.SimilarityQueries
      .ivfCellBounds(spark, dir, cfg).count()
    val layoutRows = operators.SimilarityQueries
      .q8ByCid(spark, dir, cfg).count()
    val foundSec = (System.nanoTime() - t0) / 1e9
    require(nlist == 63L, s"expected 63 cluster-aligned centroids: $nlist")
    require(layoutRows == n, s"layout covers the corpus: $layoutRows != $n")
    val live = operators.SimilarityQueries
      .rangeLiveCells(spark, dir, cfg, floor).count()

    def timed(df: => org.apache.spark.sql.DataFrame): (Double, Long) = {
      val runs = (1 to passes).map { _ =>
        val s0 = System.nanoTime()
        val c = df.count()
        ((System.nanoTime() - s0) / 1e9, c)
      }
      (runs.map(_._1).sorted.apply(runs.size / 2), runs.head._2)
    }
    val (bruteSec, bruteN) = timed(
      operators.SimilarityQueries.rangeCosineWith(spark, dir, floor))

    // the REGISTERED cells query — in persist mode this reads the
    // staged cid-partitioned layout with dynamic partition pruning
    val (partSec, partN) = timed(
      operators.SimilarityQueries
        .rangeCosineCellsWith(spark, dir, cfg, floor))
    require(partN == bruteN,
      s"EXACTNESS BROKEN: layout cells $partN vs brute $bruteN matches")

    // CONTROL: the historical unpartitioned in-place plan — cell table
    // join + per-id vector fetch over the unpartitioned q8 stage. Same
    // exactness contract, REQUIRED-equal result; its cost is the
    // corpus-wide shuffle the layout exists to remove. SYMMETRY (r19
    // review): the control derives its surviving-cell set INSIDE the
    // timed region, exactly like the registered layout query above —
    // a precomputed-checkpoint control would be excused from work the
    // layout row pays, and the two speedups would measure different
    // things.
    val liveCids = operators.SimilarityQueries
      .rangeLiveCells(spark, dir, cfg, floor)
      .select(col("cid")).distinct().count()
    def inplace() = {
      val q8 = operators.SimilarityQueries.quantized(spark, dir)
      operators.SimilarityQueries.ivfCells(spark, dir, cfg)
        .filter(col("rn") === 1)
        .select(col("vec_id").as("neighbor_id"), col("cid"))
        .join(broadcast(operators.SimilarityQueries
          .rangeLiveCells(spark, dir, cfg, floor)), "cid")
        .filter(col("neighbor_id") =!= col("query_id"))
        .join(q8.select(col("vec_id").as("neighbor_id"),
          col("q8").as("nv")), "neighbor_id")
        .join(broadcast(q8.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("q8").as("qv"))
          .withColumn("f", floor)), "query_id")
        .withColumn("dot", expr("CAST(vec_dot(qv, nv) AS BIGINT)"))
        .filter(col("dot") >= col("f"))
        .select(col("query_id"), col("neighbor_id"), col("dot"))
    }
    val (cellSec, cellN) = timed(inplace())
    require(cellN == bruteN,
      s"EXACTNESS BROKEN: in-place cells $cellN vs brute $bruteN matches")

    println(f"""{"metric":"range_bench","n":$n,"passes":$passes,"calib_sec":$calibSec%.3f,"nlist":$nlist,"found_sec":$foundSec%.3f,"surviving_cells":$live,"total_cells":${10 * nlist},"partitions_read":$liveCids,"matches":$bruteN,"brute_sec":$bruteSec%.3f,"cells_sec":$cellSec%.3f,"cells_part_sec":$partSec%.3f,"speedup_inplace":${bruteSec / cellSec}%.2f,"speedup_partitioned":${bruteSec / partSec}%.2f,"layout":"staged"}""")
    spark.stop()
    System.out.flush()
  }
}
