package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deterministic corpus replication for scale evidence (SCALE.md): the
  * sf-dir's `documents`/`embeddings` grown K× with FIXED content so two
  * runs measure the same bytes.
  *
  * Replica semantics (and why):
  *  - `doc_id`/`vec_id` offset by replica × 10^8 — ids stay disjoint and
  *    the blocked-packing `doc_id DIV block` arithmetic keeps producing
  *    globally unique shards.
  *  - replica 0 is the base corpus verbatim; replicas ≥ 1 prefix every
  *    TOKEN with the replica index, so cross-replica shingle sets are
  *    DISJOINT: the near-dup chain sees K independent copies of the base
  *    corpus' duplicate structure (candidate pairs scale ~K×, as a crawl
  *    K× bigger with the same dup rate would), never a pathological
  *    K-clique of replicas of one doc.
  *  - embeddings keep their vectors (ties rank deterministically by id);
  *    queries stay `vec_id < 10` = replica 0, so ANN measures a fixed
  *    query set probing a K× candidate corpus — the scan-scaling story.
  */
object ScaleData {
  /** Id offset between replicas; base ids must stay strictly below it. */
  private val ReplicaStride = 100000000L

  def replicate(spark: SparkSession, base: String, out: String, k: Int): Unit = {
    require(k >= 1, s"k must be >= 1: $k")
    // A base corpus with ids >= the stride would silently produce
    // COLLIDING replica ids, breaking the disjoint-ids invariant ScaleSpec
    // and the blocked-packing shard math rely on (and aliasing
    // CurationBench's pmod fetchTs mapping). One cheap agg guards it.
    val maxIds = Tables.documents(spark, base).agg(max(col("doc_id"))).head()
      .getLong(0) -> Tables.embeddings(spark, base)
      .agg(max(col("vec_id"))).head().getLong(0)
    require(maxIds._1 < ReplicaStride && maxIds._2 < ReplicaStride,
      s"base ids exceed the replica stride $ReplicaStride " +
        s"(max doc_id=${maxIds._1}, max vec_id=${maxIds._2}): replicas " +
        "would collide — raise the stride before replicating this corpus")
    val reps = explode(array((0 until k).map(lit): _*)).as("rep")
    Tables.documents(spark, base)
      .select(col("doc_id"), col("text"), col("lang"), col("source"), reps)
      .select(
        (col("doc_id") + col("rep").cast("long") * ReplicaStride).as("doc_id"),
        when(col("rep") === 0, col("text"))
          .otherwise(array_join(transform(split(col("text"), " "),
            t => concat(col("rep").cast("string"), lit("x"), t)), " "))
          .as("text"),
        col("lang"), col("source"), col("rep"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("rep")
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    Tables.embeddings(spark, base)
      .select(col("vec_id"), col("embedding"), col("label"), reps)
      .select(
        (col("vec_id") + col("rep").cast("long") * ReplicaStride).as("vec_id"),
        col("embedding"), col("label"))
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
  }

  /** Replicate-once cache shared by every scale consumer ([[ScaleBench]],
    * [[CurationBench]]): the K× copy of `base` lives under /tmp keyed by
    * (base name, K), built on first use, marked complete by a sentinel
    * file. ONE implementation of the cache protocol — two hand-rolled
    * copies would drift. The sentinel records a content fingerprint of
    * the base corpus (doc/vec counts + id checksums): a base dir
    * REGENERATED with different content under the same name invalidates
    * the cache instead of silently serving stale replicas to every later
    * bench run. Returns the replica dir. */
  def ensureReplicated(spark: SparkSession, base: String, k: Int): String = {
    val dir = s"/tmp/graft_scale_${new java.io.File(base).getName}_x$k"
    val marker = new java.io.File(s"$dir/_REPLICATED_OK")
    val fp = fingerprint(spark, base)
    val stale = marker.exists() && {
      val recorded = try new String(java.nio.file.Files.readAllBytes(
        marker.toPath), java.nio.charset.StandardCharsets.UTF_8)
      catch { case _: java.io.IOException => "" }
      recorded != fp
    }
    if (!marker.exists() || stale) {
      if (stale) org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"scale cache $dir is stale for $base (fingerprint changed) — rebuilding")
      replicate(spark, base, dir, k)
      marker.getParentFile.mkdirs()
      java.nio.file.Files.write(marker.toPath,
        fp.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      ()
    }
    dir
  }

  /** Deterministic CLUSTERED embedding fixture (r17 verdict ask #6):
    * every historical recall row rode uniform-random embeddings, where
    * PQ/IVF structurally underperform (each round's documented
    * disclaimer). This corpus is the deployment-shaped counterpart —
    * `clusters` well-separated integer seed vectors plus bounded integer
    * jitter, ALL hash arithmetic (xxhash64), no RNG state — so recall
    * rows reproduce bit-identically across runs and engines. Components
    * are exact multiples of 1/64, so the int8 quantization
    * (floor(v·64)) is lossless and every exact-integer dot matches an
    * oracle's. Layout: seed(c, d) ∈ [-80, 80], jitter(v, d) ∈ [-4, 4],
    * cluster = vec_id % clusters — the 10 query vectors (vec_id < 10)
    * land in 10 distinct clusters of ~n/clusters members each.
    *
    * `clusters` must be coprime with the index families' id-rule strides
    * (codewords at vec_id ≡ 11 mod 50, centroids at ≡ 7 mod 100): the
    * default 31 makes the 40 rule codewords sweep EVERY cluster residue,
    * so the sampled codebook covers every cluster the way a trained one
    * would. (An even count is a trap: the all-odd codeword ids then
    * cover only odd clusters and half the queries encode to garbage —
    * measured recall 0.18 before this constraint.) Cached
    * under /tmp like [[ensureReplicated]] (the content is a pure
    * function of the parameters, so a marker suffices). Returns a dir
    * holding ONLY embeddings.parquet — the ANN queries' sole input. */
  def ensureClustered(spark: SparkSession, n: Long = 2000L,
      clusters: Int = 31, dims: Int = 64): String = {
    require(n > 0 && clusters >= 10 && dims > 0,
      s"bad clustered-fixture shape: n=$n clusters=$clusters dims=$dims")
    require(clusters % 2 == 1 && clusters % 5 != 0,
      s"clusters must be coprime with the id-rule strides (50, 100): " +
        s"$clusters")
    val dir = s"/tmp/graft_clustered_n${n}_k${clusters}_d$dims"
    val marker = new java.io.File(s"$dir/_CLUSTERED_OK")
    if (!marker.exists()) {
      val emb = expr(
        s"""transform(sequence(0, ${dims - 1}), d -> CAST(
           |  greatest(-127L, least(127L,
           |    (pmod(xxhash64('seed', id % $clusters, d), 161) - 80) +
           |    (pmod(xxhash64('jit', id, d), 9) - 4))) / 64.0
           |  AS FLOAT))""".stripMargin)
      spark.range(n)
        .select(col("id").as("vec_id"), emb.as("embedding"),
          (col("id") % 10).cast("int").as("label"))
        .repartition(4)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      marker.getParentFile.mkdirs()
      java.nio.file.Files.write(marker.toPath,
        "ok".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      ()
    }
    dir
  }

  /** Cheap content fingerprint of a base corpus: row counts, id sums, and
    * VALUE hashes over both tables (one narrow agg each — milliseconds at
    * bench scale). The value terms matter: a corpus regenerated with a new
    * embedding seed or reworded texts under the SAME id layout must
    * invalidate the cache, so text and embedding content fold in via
    * xxhash64 (pmod before summing — ANSI mode overflows a raw sum of
    * 64-bit hashes). */
  private def fingerprint(spark: SparkSession, base: String): String = {
    val P = 1000000007L
    val d = Tables.documents(spark, base)
      .agg(count(lit(1)), sum(col("doc_id")),
        sum(pmod(xxhash64(col("text")), lit(P)))).head()
    val e = Tables.embeddings(spark, base)
      .agg(count(lit(1)), sum(col("vec_id")),
        sum(pmod(xxhash64(col("embedding")), lit(P)))).head()
    s"v2:${d.getLong(0)}:${d.getLong(1)}:${d.getLong(2)}:" +
      s"${e.getLong(0)}:${e.getLong(1)}:${e.getLong(2)}"
  }
}

/** Scale-evidence bench (SCALE.md's measured rows): times the three
  * corpus-bound families — the staged near-dup chain (`dedup_components`
  * pays shingles→MinHash→LSH→verify→CC cold), int8 exhaustive ANN, and
  * blocked sequence packing — on the base sf dir AND a K×-replicated copy,
  * same 3-pass-median method as [[Bench]]. One JSON line per (dir, query)
  * plus a final summary line. Env: SPARK_GRAFT_SF_DIR (base),
  * SPARK_GRAFT_SCALE_X (default 10), SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_BENCH_PASSES. */
object ScaleBench {
  private val Families = Seq(
    "dedup_chain" -> "dedup_components",
    "ann_int8" -> "ann_topk_int8",
    "pack_blocked" -> "pack_sequences_blocked",
    // the r8 verdict's one `weak`: after the per-(source, n_tok) histogram
    // rewrite the corpus is never globally sorted, so — like blocked
    // packing — wall should stay flat-ish as the corpus replicates
    "length_band" -> "length_band_filter")

  /** The approximate ANN variants whose recall the scale rows report
    * (r17 adds the capped-cardinality quantizer and the PQ rerank rung —
    * the two deployment shapes the r16 verdict asked for). */
  private[graft] val AnnVariants =
    Seq("ann_topk_lsh", "ann_topk_ivf", "ann_topk_ivf_tuned",
      "ann_topk_ivf_int8", "ann_topk_ivf_capped", "ann_topk_ivf_refined",
      "ann_topk_pq_rerank", "ann_topk_ivfpq_rerank", "ann_topk_ivfadc",
      "ann_topk_pq_refined", "ann_topk_ivfadc_refined",
      "ann_topk_ivfpq_rerank_refined")

  /** Mean recall@5 of each approximate ANN variant against the brute-force
    * gold standard ON `dir` — at scale the quality knobs (nlist, nprobe,
    * planes, int8 resolution) are as load-bearing as wall-clock, so the
    * scale table reports both: a variant that got fast by returning the
    * wrong neighbors fails the recall column, not just a spec at sf0.001.
    * Driver-side work is bounded by |queries|·k rows per variant. */
  // private[graft]: ScaleSpec's recall gates reuse these — two
  // definitions of recall@5 could drift apart (r17 review)
  private[graft] def topSets(df: org.apache.spark.sql.DataFrame)
      : Map[Long, Set[Long]] =
    df.filter(col("rank") <= 5).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }

  private[graft] def meanRecall(gold: Map[Long, Set[Long]],
      got: Map[Long, Set[Long]]): Double =
    gold.keys.toSeq.map { q =>
      (gold(q) & got.getOrElse(q, Set.empty)).size.toDouble / gold(q).size
    }.sum / gold.size

  private[graft] def annRecallAt5(spark: SparkSession,
      dir: String): Map[String, Double] = {
    def tops(name: String): Map[Long, Set[Long]] =
      topSets(SparkEntry.queries(name)(spark, dir))
    val gold = tops("ann_topk_brute")
    require(gold.nonEmpty, s"brute gold standard empty on $dir")
    AnnVariants.map(n => n -> meanRecall(gold, tops(n))).toMap
  }

  private def dirBytes(spark: SparkSession, dir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0L
    else fs.getContentSummary(p).getLength
  }

  /** Recall@5 of IVF at several nprobe settings on `dir` — the quality
    * knob quantified: nlist grows ~N/100 with the corpus, so a FIXED
    * nprobe probes a shrinking fraction of cells and recall falls (the
    * suite's oracle-pinned `ann_topk_ivf` stays at nprobe=2; production
    * keeps nprobe/nlist roughly constant instead). Built on
    * [[operators.SimilarityQueries.ivfCellsRaw]] — the SAME centroid rule,
    * scoring, and tie-break as the real operator, so the published sweep
    * characterizes the index that actually runs, not a copy that could
    * drift. The wide cell table is a bench-local checkpoint (the staged
    * ivf_cells stays at the oracle-pinned maxRn = 2). */
  private[graft] def ivfRecallSweep(spark: SparkSession, dir: String,
      nprobes: Seq[Int],
      cfg: operators.IvfConfig = operators.IvfConfig.Default)
      : Seq[(Int, Double)] = {
    import operators.SimilarityQueries.{ivfCellsRaw, normed, rankTopK}
    val cells = ivfCellsRaw(spark, dir, maxRn = nprobes.max, cfg)
      .localCheckpoint(eager = true)
    val e = normed(spark, dir)
    val gold = topSets(SparkEntry.queries("ann_topk_brute")(spark, dir))
    val out = nprobes.map { p =>
      val q = cells.filter(col("vec_id") < 10 && col("rn") <= p)
        .select(col("vec_id").as("query_id"), col("cid"))
      val c = cells.filter(col("rn") === 1)
        .select(col("vec_id").as("neighbor_id"), col("cid").as("ccid"))
      val cand = q.join(c, col("cid") === col("ccid") &&
          col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id")).distinct()
      val scored = cand
        // broadcast: BOUNDED — fixed 10-row literal query set.
        .join(broadcast(e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("emb").as("qe"),
            col("norm").as("qn"))), "query_id")
        .join(e.select(col("vec_id").as("neighbor_id"), col("emb").as("ce"),
          col("norm").as("cn")), "neighbor_id")
        .withColumn("cos", expr("vec_dot(qe, ce) / (qn * cn)"))
      p -> meanRecall(gold, topSets(rankTopK(scored, "cos", 5)))
    }
    cells.unpersist()
    out
  }

  def main(args: Array[String]): Unit = {
    val base = Bench.envSfDir
    val k = math.max(1, sys.env.get("SPARK_GRAFT_SCALE_X")
      .flatMap(_.toIntOption).getOrElse(10))
    val passes = Bench.envPasses
    val spark = SparkSession.builder()
      .master(s"local[${Bench.envCpus}]")
      .config("spark.sql.shuffle.partitions", Bench.envCpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // machine-speed context (same probe + band as Bench): scale rows and
    // recall tables are only comparable across runs with calib attached
    val calibSec =
      try Bench.calibrationProbe(spark)
      catch { case scala.util.control.NonFatal(_) => -1.0 }
    val rep = ScaleData.ensureReplicated(spark, base, k)
    val results = for {
      (dirLabel, dir) <- Seq("base" -> base, s"x$k" -> rep)
      (fam, q) <- Families
    } yield {
      val fn = SparkEntry.queries(q)
      val times = (1 to passes).map { _ =>
        operators.Staged.reset(spark)
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val med = Bench.median(times)
      val rows = fn(spark, dir).count()
      (dirLabel, fam, q, med, rows)
    }
    val docRows = Seq("base" -> base, s"x$k" -> rep).map { case (l, d) =>
      l -> Tables.documents(spark, d).count()
    }.toMap
    val bytes = Seq("base" -> base, s"x$k" -> rep).map { case (l, d) =>
      l -> (dirBytes(spark, s"$d/documents.parquet") +
        dirBytes(spark, s"$d/embeddings.parquet"))
    }.toMap
    // recall columns (r8 verdict ask #5): measured AFTER the timing loop so
    // the staged-table builds they trigger never pollute a timing pass
    val recalls = Seq("base" -> base, s"x$k" -> rep).map { case (l, d) =>
      operators.Staged.reset(spark)
      l -> annRecallAt5(spark, d)
    }
    results.foreach { case (dl, fam, q, med, rows) =>
      println(f"""SCALE_ROW {"dir":"$dl","family":"$fam","query":"$q","median_sec":$med%.3f,"out_rows":$rows,"doc_rows":${docRows(dl)},"corpus_bytes":${bytes(dl)}}""")
    }
    recalls.foreach { case (dl, byVariant) =>
      byVariant.toSeq.sortBy(_._1).foreach { case (variant, r) =>
        println(f"""RECALL_ROW {"dir":"$dl","query":"$variant","recall_at_5":$r%.3f}""")
      }
    }
    // the nprobe knob, quantified on the un-replicated base (replication
    // saturates recall with identical copies — see SCALE.md). Reset first:
    // the replica recall pass above staged the Kx-corpus tables (normed,
    // buckets, cells, q8 — the run's largest blocks), which would sit
    // resident under the sweep's own checkpoints for no reason.
    //
    // TWO operating points (r13 verdict ask #3): the default centroid rule
    // and a 2x-denser one, with nprobe lists chosen so the PROBED
    // FRACTIONS match pairwise — the deployment rule's actual claim is
    // that recall tracks the probed fraction across nlist, and these
    // paired rows are what validates (or falsifies) it on a given corpus.
    // Each row carries (nlist, probed_fraction, recall) — exactly the
    // (fraction, recall) shape `IvfConfig(sweep = ...)` ingests, so a
    // deployment feeds its own measured rows straight back into the
    // config instead of inheriting the repo's hard-coded curve.
    val sweepCfgs = Seq(
      ("default", operators.IvfConfig.Default, Seq(1, 2, 4, 8)),
      ("dense2x", operators.IvfConfig(centroidEvery = 50L), Seq(2, 4, 8, 16)))
    sweepCfgs.foreach { case (label, cfg, nprobes) =>
      operators.Staged.reset(spark)
      val nlist = operators.SimilarityQueries.normed(spark, base)
        .filter(cfg.centroidFilter).count()
      ivfRecallSweep(spark, base, nprobes, cfg).foreach { case (p, r) =>
        println(f"""IVF_SWEEP {"dir":"base","config":"$label","nlist":$nlist,"nprobe":$p,"probed_fraction":${p.toDouble / nlist}%.4f,"recall_at_5":$r%.3f}""")
      }
    }
    // clustered-recall rows (r17 verdict ask #6): the deployment-shaped
    // fixture — see ScaleData.ensureClustered. Measured LAST so its
    // staged tables never pollute a timing pass; reset first for the
    // same reason as the sweep. Gold split BY METRIC: each cluster
    // holds ~64 near-duplicates, where cosine and exact dot genuinely
    // disagree about which 5 near-ties rank first (norm spread), so the
    // cosine-scored IVF variants report vs the cosine brute gold and
    // the dot-scored PQ rows vs the exhaustive int8 scan they
    // approximate — each family against its own exhaustive limit.
    operators.Staged.reset(spark)
    val clDir = ScaleData.ensureClustered(spark)
    val clRecalls = {
      def tops(name: String): Map[Long, Set[Long]] =
        topSets(SparkEntry.queries(name)(spark, clDir))
      val goldCos = tops("ann_topk_brute")
      val goldInt8 = tops("ann_topk_int8")
      require(goldCos.nonEmpty && goldInt8.nonEmpty)
      (AnnVariants :+ "ann_topk_pq").sorted.map { v =>
        val dotScored = v.contains("pq") || v == "ann_topk_ivf_int8" ||
          v == "ann_topk_ivf_refined" || v.startsWith("ann_topk_ivfadc")
        val gold = if (dotScored) goldInt8 else goldCos
        (v, if (dotScored) "int8" else "cosine",
          meanRecall(gold, tops(v)))
      }
    }
    clRecalls.foreach { case (variant, gold, r) =>
      println(f"""RECALL_ROW {"dir":"clustered","query":"$variant","gold":"$gold","recall_at_5":$r%.3f}""")
    }
    // range-prune rows (r18): how much of the corpus the exact range
    // query's Cauchy–Schwarz cell bound eliminates, on both fixtures —
    // survivors/total (query, cell) pairs plus the row-count identity
    // with the brute rung (soundness is spec-gated; this is the
    // measured-fraction evidence). The clustered fixture is the
    // deployment shape; the uniform base corpus is the honest
    // prune-neutral bound.
    Seq(("clustered", clDir), ("base", base)).foreach { case (dl, d) =>
      operators.Staged.reset(spark)
      val cfg = operators.IvfConfig.Default
      val live = operators.SimilarityQueries
        .rangeLiveCells(spark, d, cfg).count()
      val nlist = operators.SimilarityQueries
        .ivfCellBounds(spark, d, cfg).count()
      val pruned = SparkEntry.queries("ann_range_cosine_cells")(spark, d)
        .count()
      val brute = SparkEntry.queries("ann_range_cosine")(spark, d).count()
      require(pruned == brute,
        s"range cell bound broke exactness on $dl: $pruned vs $brute")
      // the bytes rung + the composed shape (r18): per-vector survivor
      // counts of the residual ceiling, standalone and after the cells
      // rung — both REQUIRED exact
      val corpusN = Tables.embeddings(spark, d).count()
      val pqSurv = operators.SimilarityQueries
        .rangePqSurvivors(spark, d).count()
      require(SparkEntry.queries("ann_range_cosine_pq")(spark, d)
        .count() == brute,
        s"range residual ceiling broke exactness on $dl")
      require(SparkEntry.queries("ann_range_cosine_ivfpq")(spark, d)
        .count() == brute,
        s"composed range shape broke exactness on $dl")
      // the TRAINED quantizer's prune (r18): same bound, Lloyd-refined
      // geometry — rr is the quantity Lloyd descends, so the refined
      // survivor column is the measured payoff of ivf_refine beyond
      // recall. Exactness REQUIRED like every rung.
      val liveRefined = operators.SimilarityQueries
        .rangeLiveCellsRefined(spark, d, cfg).count()
      require(SparkEntry.queries("ann_range_cosine_cells_refined")(spark, d)
        .count() == brute,
        s"refined range cell bound broke exactness on $dl")
      // the TRAINED bytes rung (r19): the per-subspace-Lloyd codebook's
      // residual ceiling — training shrinks rrv, the exact quantity the
      // refusal tests, so the trained survivor fraction is the measured
      // payoff of pq_refine for the range family. Exactness REQUIRED.
      val pqRefSurv = operators.SimilarityQueries
        .rangePqSurvivorsRefined(spark, d).count()
      require(SparkEntry.queries("ann_range_cosine_pq_refined")(spark, d)
        .count() == brute,
        s"trained range residual ceiling broke exactness on $dl")
      require(SparkEntry.queries("ann_range_cosine_ivfpq_refined")(spark, d)
        .count() == brute,
        s"fully-trained composed range shape broke exactness on $dl")
      println(f"""RANGE_ROW {"dir":"$dl","surviving_cells":$live,"total_cells":${10 * nlist},"survivor_fraction":${live.toDouble / (10 * nlist)}%.3f,"refined_surviving_cells":$liveRefined,"refined_survivor_fraction":${liveRefined.toDouble / (10 * nlist)}%.3f,"pq_survivors":$pqSurv,"pq_candidates":${10 * (corpusN - 1)},"pq_survivor_fraction":${pqSurv.toDouble / (10 * (corpusN - 1))}%.3f,"pq_refined_survivors":$pqRefSurv,"pq_refined_survivor_fraction":${pqRefSurv.toDouble / (10 * (corpusN - 1))}%.3f,"matches":$brute}""")
    }
    val summary = (results.map { case (dl, fam, _, med, _) =>
      f""""${dl}_$fam":$med%.3f"""
    } ++ recalls.flatMap { case (dl, byVariant) =>
      byVariant.toSeq.sortBy(_._1).map { case (v, r) =>
        f""""${dl}_recall5_${v.stripPrefix("ann_topk_")}":$r%.3f""" }
    } ++ clRecalls.map { case (v, _, r) =>
      f""""clustered_recall5_${v.stripPrefix("ann_topk_")}":$r%.3f""" })
      .mkString(",")
    spark.stop()
    println(f"""{"metric":"scale_bench","x":$k,"passes":$passes,"calib_sec":$calibSec%.3f,$summary}""")
    System.out.flush()
  }
}
