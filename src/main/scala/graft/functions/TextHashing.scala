package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, cross-engine-reproducible text hashing primitives for the
  * dedup family (SURVEY.md §2.3). Everything bottoms out in md5 over UTF-8
  * strings — the one hash both Spark and the DuckDB oracle compute
  * identically — so every operator built here is oracle-checkable.
  *
  * All functions are pure Column expressions (codegen'd, no UDFs) and keep
  * the whole pipeline inside whole-stage codegen.
  */
object TextHashing {

  /** Whitespace tokens of a document. */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct word k-shingles; a document shorter than k words contributes
    * its whole text as the single shingle. */
  def shingles(toks: Column, k: Int = 3): Column =
    array_distinct(
      transform(
        sequence(lit(1), greatest(size(toks) - (k - 1), lit(1))),
        i => concat_ws(" ", slice(toks, i, lit(k)))))

  /** One MinHash value: lexicographic min of seeded md5 over the exploded
    * shingle column. Fixed-width lowercase hex ⇒ string min ≡ numeric min. */
  def minhashAgg(shingle: Column, seed: Int): Column =
    min(md5(concat(lit(s"$seed:"), shingle)))

  /** (doc_id, shingle) exploded distinct shingle sets. */
  def shingleSets(docs: DataFrame, k: Int = 3): DataFrame = {
    val toks = docs.select(col("doc_id"), tokens(col("text")).as("toks"))
    toks.select(col("doc_id"),
      explode(shingles(col("toks"), k)).as("shingle"))
  }

  /** MinHash signature table: doc_id, h0..h{n-1}. */
  def minhashSignatures(docs: DataFrame, n: Int = 16, k: Int = 3): DataFrame = {
    val sh = shingleSets(docs, k)
    val aggs = (0 until n).map(i => minhashAgg(col("shingle"), i).as(s"h$i"))
    sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** Banded LSH bucket table: (doc_id, band, sig) — one row per band, sig =
    * md5 of the band's concatenated minhashes. Docs sharing (band, sig) are
    * near-dup candidates. Shuffle-friendly: bucketing is a plain groupBy
    * key, no driver state, no cross join. */
  def lshBands(docs: DataFrame, bands: Int = 4, rowsPerBand: Int = 4,
      k: Int = 3): DataFrame = {
    val mh = minhashSignatures(docs, bands * rowsPerBand, k)
    (0 until bands).map { b =>
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(i => col(s"h$i"))
      mh.select(col("doc_id"), lit(b).as("band"),
        md5(concat(cols: _*)).as("sig"))
    }.reduce(_ union _)
  }

  /** Candidate near-dup pairs (doc_a < doc_b) from banded LSH. At 100 TB the
    * self-join is per-(band,sig) bucket — skew only if a bucket is hot,
    * which band hashing prevents for non-pathological corpora. */
  def lshCandidatePairs(docs: DataFrame, bands: Int = 4, rowsPerBand: Int = 4,
      k: Int = 3): DataFrame = {
    val bt = lshBands(docs, bands, rowsPerBand, k)
    val a = bt.as("a")
    val b = bt.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.sig") === col("b.sig")
        && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** Exact n-gram Jaccard for the given candidate pairs: intersection via a
    * shingle join, union by inclusion-exclusion. Integers throughout; the
    * final ratio is one double division (deterministic). */
  def jaccard(docs: DataFrame, pairs: DataFrame, k: Int = 3): DataFrame = {
    val sh = shingleSets(docs, k)
    val sizes = sh.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"))
    val inter = pairs
      .join(sh.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sh.as("sb"),
        col("doc_b") === col("sb.doc_id") &&
          col("sa.shingle") === col("sb.shingle"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.as("za"), col("doc_a") === col("za.doc_id"))
      .join(sizes.as("zb"), col("doc_b") === col("zb.doc_id"))
      .select(col("doc_a"), col("doc_b"), col("n_inter"),
        col("za.n_shingles").as("n_a"), col("zb.n_shingles").as("n_b"),
        (col("n_inter").cast("double") /
          (col("za.n_shingles") + col("zb.n_shingles") - col("n_inter"))
            .cast("double")).as("jaccard"))
  }

  /** 64-bit SimHash as a 64-char '0'/'1' string. Bit source: the 16 hex
    * digits of md5(token), 4 bits each, LSB-first within a digit; bit value
    * = sign of the ±1 vote sum over the document's distinct tokens. */
  def simhash(docs: DataFrame): DataFrame = {
    val tok = docs
      .select(col("doc_id"),
        explode(array_distinct(tokens(col("text")))).as("tok"))
      .withColumn("h", md5(col("tok")))
    val pos = tok
      .select(col("doc_id"), col("h"),
        explode(sequence(lit(1), lit(16))).as("pos"))
      .withColumn("d",
        expr("instr('0123456789abcdef', substr(h, pos, 1)) - 1"))
    val sums = pos.groupBy(col("doc_id"), col("pos")).agg(
      sum(expr("(d % 2) * 2 - 1")).as("s0"),
      sum(expr("((d div 2) % 2) * 2 - 1")).as("s1"),
      sum(expr("((d div 4) % 2) * 2 - 1")).as("s2"),
      sum(expr("((d div 8) % 2) * 2 - 1")).as("s3"))
    val chars = sums.select(col("doc_id"), col("pos"),
      expr("""concat(
          CASE WHEN s0 >= 0 THEN '1' ELSE '0' END,
          CASE WHEN s1 >= 0 THEN '1' ELSE '0' END,
          CASE WHEN s2 >= 0 THEN '1' ELSE '0' END,
          CASE WHEN s3 >= 0 THEN '1' ELSE '0' END)""").as("b4"))
    chars.groupBy(col("doc_id")).agg(
      expr("array_join(transform(array_sort(collect_list(struct(pos, b4))), x -> x.b4), '')")
        .as("simhash"))
  }

  /** Connected components over an undirected edge list (src, dst) by
    * iterative smallest-id propagation — the scalable cluster closure for
    * near-dup pairs (no driver-side union-find; each iteration is one
    * shuffle). Converges in O(diameter) iterations; near-dup clusters are
    * tiny, so maxIter=10 is generous. Returns (doc_id, component). */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
      maxIter: Int = 10): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
    var labels = vertices.select(col("doc_id"),
      col("doc_id").as("component"))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val neighborMin = sym
        .join(labels, sym("dst") === labels("doc_id"))
        .groupBy(col("src")).agg(min(col("component")).as("nbr_min"))
      val updated = labels
        .join(neighborMin, labels("doc_id") === neighborMin("src"), "left")
        .select(col("doc_id"),
          least(col("component"),
            coalesce(col("nbr_min"), col("component"))).as("component"))
      val changed = updated.as("u")
        .join(labels.as("l"), col("u.doc_id") === col("l.doc_id"))
        .filter(col("u.component") =!= col("l.component"))
        .limit(1).count()
      labels = updated.localCheckpoint(eager = true)
      converged = changed == 0
      iter += 1
    }
    labels
  }
}
