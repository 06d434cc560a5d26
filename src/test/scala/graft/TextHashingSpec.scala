package graft

import graft.functions.TextHashing
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the dedup hashing primitives (SURVEY §5.2 #2 for the
  * §2.3 family): these hold for ANY corpus, complementing the DuckDB
  * value-equality gate which checks one corpus exactly. */
class TextHashingSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def check(prop: Prop): Unit = {
    // Spark jobs per case: keep the sample count moderate
    val params = SCTest.Parameters.default.withMinSuccessfulTests(10)
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  private val wordGen = Gen.oneOf(
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta")
  private val docGen = Gen.chooseNum(1, 12)
    .flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))

  private def docsDf(texts: Seq[String]) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("property: minhash values lie in [0, P) and equal texts get equal signatures") {
    check(Prop.forAll(Gen.listOfN(6, docGen)) { texts =>
      val docs = docsDf(texts ++ texts) // every text appears twice
      val sig = TextHashing.minhashSignatures(docs, n = 4).collect()
      val byDoc = sig.map(r => r.getLong(0) ->
        (1 to 4).map(r.getLong(_))).toMap
      val inRange = byDoc.values.flatten
        .forall(h => h >= 0 && h < TextHashing.MinhashP)
      val dupsAgree = texts.indices.forall { i =>
        byDoc(i.toLong) == byDoc((i + texts.length).toLong)
      }
      inRange && dupsAgree
    })
  }

  test("property: jaccard of a doc with itself is 1; candidates always include exact dups") {
    check(Prop.forAll(Gen.listOfN(4, docGen)) { texts =>
      val docs = docsDf(texts ++ texts)
      val pairs = TextHashing.lshCandidatePairs(docs).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // every (i, i+n) exact-dup pair must be an LSH candidate (identical
      // signatures share every band)
      val dupsCaught = texts.indices.forall { i =>
        pairs.contains((i.toLong, (i + texts.length).toLong))
      }
      val jac = TextHashing.jaccard(docs,
          Seq((0L, texts.length.toLong)).toDF("doc_a", "doc_b"))
        .collect().headOption
      dupsCaught && jac.forall(_.getAs[Double]("jaccard") == 1.0)
    })
  }

  test("property: jaccardOnCandidates over the raw explode equals jaccardFrom over the distinct sets") {
    // the raw-shingle staging refactor's contract: restricting to candidate
    // docs and dedup-ing only that sliver changes nothing about the
    // numbers — for ANY corpus and ANY candidate pair set
    check(Prop.forAll(Gen.listOfN(5, docGen)) { texts =>
      val docs = docsDf(texts ++ texts.headOption.toSeq) // ensure ≥1 dup pair
      val raw = TextHashing.shingleSetsRaw(docs)
      val pairs = TextHashing.lshCandidatePairsFrom(raw)
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("jaccard")
      val viaCandidates =
        TextHashing.jaccardOnCandidates(raw,
          graft.functions.Materialized(pairs)).collect().map(key).toMap
      val viaDistinct =
        TextHashing.jaccardFrom(
          raw.dropDuplicates("doc_id", "shingle"), pairs)
          .collect().map(key).toMap
      viaCandidates == viaDistinct
    })
  }

  test("property: codegen char_ngrams/word_ngrams match the transform(sequence) formulation") {
    graft.functions.NgramExprs.register(spark)
    // alphabet includes multi-byte UTF-8 (2-, 3-, 4-byte) — substringSQL
    // indexes by CHAR; a byte-offset bug would shear these
    val textGen = for {
      n <- Gen.chooseNum(0, 30)
      cs <- Gen.listOfN(n,
        Gen.oneOf("a", "b", "c", " ", " ", "é", "ß", "中", "文", "🦀"))
    } yield cs.mkString
    check(Prop.forAll(Gen.listOfN(6, textGen)) { texts =>
      val df = docsDf(texts)
        .withColumn("toks", split(col("text"), " "))
        .select(
          call_function("char_ngrams", col("text"), lit(3)).as("cg_new"),
          expr("transform(sequence(1, greatest(char_length(text) - 2, 1))," +
            " i -> substr(text, i, 3))").as("cg_old"),
          call_function("word_ngrams", col("toks"), lit(3)).as("wg_new"),
          expr("transform(sequence(1, greatest(size(toks) - 2, 1))," +
            " i -> concat_ws(' ', slice(toks, i, 3)))").as("wg_old"))
      df.collect().forall { r =>
        r.getSeq[String](0) == r.getSeq[String](1) &&
          r.getSeq[String](2) == r.getSeq[String](3)
      }
    })
  }

  test("property: local union-find and distributed propagation agree on random graphs") {
    val edgeGen = for {
      n <- Gen.chooseNum(2, 20)                 // vertices 0..n-1
      m <- Gen.chooseNum(0, 25)
      es <- Gen.listOfN(m, for {
        a <- Gen.chooseNum(0, n - 1)
        b <- Gen.chooseNum(0, n - 1)
      } yield (a.toLong, b.toLong))
    } yield (n, es.filter { case (a, b) => a != b })
    check(Prop.forAll(edgeGen) { case (n, es) =>
      val vertices = (0L until n.toLong).toDF("doc_id")
      val edges = es.toDF("src", "dst")
      def labelsOf(threshold: Long): Map[Long, Long] =
        TextHashing.connectedComponents(vertices,
            graft.functions.Materialized(edges),
            localEdgeThreshold = threshold)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val local = labelsOf(Long.MaxValue)
      val distributed = labelsOf(-1L) // force the iterative path
      local == distributed && local.size == n &&
        local.forall { case (v, c) => c <= v }
    })
  }

  test("iterative CC on a deep chain converges and leaves no pinned label checkpoints beyond a constant") {
    // A 24-vertex chain forces ~diameter iterations through the doubling
    // budget (10 -> 20 -> 40). Correctness: everything collapses to
    // component 0. Lifecycle: the persistent-RDD delta after convergence
    // stays a small constant. (The eager release in connectedComponents
    // is what guarantees this DETERMINISTICALLY; in a short local run the
    // ContextCleaner also reclaims unreferenced checkpoints on GC, so
    // this bound alone cannot distinguish eager release from cleaner
    // luck — measured here: delta 3 with the release targeting the raw
    // checkpoint frame vs 5 with it mistargeted — but it does catch a
    // gross per-iteration pile-up.)
    val n = 24L
    val vertices = (0L until n).toDF("doc_id")
    val edges = (0L until n - 1).map(i => (i, i + 1)).toDF("src", "dst")
    val before = spark.sparkContext.getPersistentRDDs.size
    val out = TextHashing.connectedComponents(vertices,
      graft.functions.Materialized(edges),
      maxIter = 10, localEdgeThreshold = -1L) // force the iterative path
    val labels = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size === n && labels.values.forall(_ == 0L),
      s"chain must collapse to component 0: $labels")
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after - before <= 6,
      s"label checkpoints piled up: $before -> $after persistent RDDs " +
        s"over ~${n - 1} iterations")
  }

  test("property: simhash is 64 bits of '0'/'1' and equal for equal texts") {
    check(Prop.forAll(Gen.listOfN(4, docGen)) { texts =>
      val docs = docsDf(texts ++ texts)
      val sh = TextHashing.simhash(docs).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      sh.values.forall(s => s.length == 64 && s.forall(c => c == '0' || c == '1')) &&
        texts.indices.forall(i => sh(i.toLong) == sh((i + texts.length).toLong))
    })
  }

  test("property: a narrower simhash is the 64-bit fingerprint's prefix (r15 verdict #4)") {
    // bits vote independently, so width only truncates — the invariant
    // that makes the width knob safe to key the staged table on
    check(Prop.forAll(Gen.listOfN(4, docGen)) { texts =>
      val docs = docsDf(texts)
      val wide = TextHashing.simhash(docs, 64).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      Seq(16, 32).forall { w =>
        val narrow = TextHashing.simhash(docs, w).collect()
          .map(r => r.getLong(0) -> r.getString(1)).toMap
        narrow.forall { case (id, s) => s == wide(id).take(w) }
      }
    })
  }

  test("property: hot-bucket guard preserves components at ANY threshold for duplicate clusters") {
    // The guard's contract, generalized past the engineered ScaleSpec
    // case: when a bucket's members are TRUE duplicates (the degenerate
    // shape the guard exists for), star-collapse followed by verify + CC
    // must yield exactly the brute enumeration's components — for any
    // corpus of duplicate clusters and any threshold, including
    // threshold 1 (every multi-doc bucket collapses).
    val clusterGen = for {
      size <- Gen.chooseNum(1, 9)
      nWords <- Gen.chooseNum(4, 10)
      text <- Gen.listOfN(nWords, wordGen).map(_.mkString(" "))
    } yield (size, text)
    check(Prop.forAll(Gen.listOfN(4, clusterGen)) { clusters =>
      // per-cluster token prefix (the ScaleData-replica trick): clusters
      // are word-disjoint, so every bucket holds ONE cluster's duplicates
      // and the exactness claim below is deterministic, not probabilistic
      val texts = clusters.zipWithIndex.flatMap { case ((n, t), ci) =>
        Seq.fill(n)(t.split(" ").map(w => s"c${ci}x$w").mkString(" "))
      }
      val docs = docsDf(texts)
      val sh = TextHashing.shingleSetsRaw(docs).localCheckpoint(eager = true)
      val bt = TextHashing.lshBandsFrom(sh).localCheckpoint(eager = true)
      def comps(threshold: Long, anchors: Int = 2): Map[Long, Long] = {
        val pairs = TextHashing.candidatePairsFromBands(
          graft.functions.Materialized(bt), threshold,
          hotBucketAnchors = anchors)
        val verified = TextHashing.jaccardOnCandidates(sh,
            graft.functions.Materialized(pairs))
          .filter(col("jaccard") >= 0.7)
          .select(col("doc_a").as("src"), col("doc_b").as("dst"))
        TextHashing.connectedComponents(docs.select("doc_id"),
          graft.functions.Materialized(verified))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      }
      val brute = comps(Long.MaxValue)
      // every anchor count preserves the closure on duplicate clusters
      // (anchors are true members here; the planted-false-anchor case is
      // the dedicated spec below) — including the 1-anchor and window-
      // ranked general (>2) paths
      Seq(1L, 3L).forall(t => comps(t) == brute) &&
        Seq(1, 3, 4).forall(a => comps(1L, a) == brute)
    })
  }

  test("hot-bucket guard anchors: all-false-anchor fragmentation pinned; wider anchor count recovers (r13 verdict #4)") {
    // Docs 1..8 are a true near-dup clique; docs 0 and 9 are word-disjoint
    // chance colliders PLANTED as the hot bucket's smallest and largest
    // ids — exactly the case where BOTH default anchors are rejected by
    // the downstream verifier.
    val clique = (1L to 8L)
      .map(i => (i, "the same boilerplate text repeated here"))
    val docs = (Seq((0L, "zzz0 zzz1 zzz2 zzz3 zzz4")) ++ clique ++
      Seq((9L, "yyy0 yyy1 yyy2 yyy3 yyy4"))).toDF("doc_id", "text")
    val sh = TextHashing.shingleSetsRaw(docs).localCheckpoint(eager = true)
    // engineered single hot bucket holding all ten docs
    val bt = docs
      .select(col("doc_id"), lit(0).as("band"), lit("hot").as("sig"))
      .localCheckpoint(eager = true)
    def compsWith(anchors: Int): Map[Long, Long] = {
      val pairs = TextHashing.candidatePairsFromBands(
        graft.functions.Materialized(bt), hotBucketThreshold = 4L,
        hotBucketAnchors = anchors)
      val verified = TextHashing.jaccardOnCandidates(sh,
          graft.functions.Materialized(pairs))
        .filter(col("jaccard") >= 0.7)
        .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      TextHashing.connectedComponents(docs.select("doc_id"),
        graft.functions.Materialized(verified))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    // anchors = 2: both anchors are verifier-rejected chance colliders, so
    // every star edge dies and the clique silently fragments — the
    // documented residual risk of ANY sub-quadratic collapse. Pinned here
    // so the tradeoff stays observable, not accidental.
    val two = compsWith(2)
    assert((0L to 9L).forall(i => two(i) == i),
      s"expected full fragmentation under two planted false anchors: $two")
    // anchors = 4: the two extra anchors (second-smallest/second-largest
    // ids) are true members, so their stars reconnect the clique even
    // though the outermost anchors are still false positives.
    val four = compsWith(4)
    assert((1L to 8L).forall(i => four(i) == 1L),
      s"4-anchor star must reconnect the clique through the true anchors: $four")
    assert(four(0L) == 0L && four(9L) == 9L,
      "the false positives must stay singletons under any anchor count")
  }

  test("hot-bucket guard: two word-disjoint clusters colliding into one hot bucket are recovered by their own bands (r13 ADVICE)") {
    val a = (0L to 5L).map(i => (i, "cluster alpha text body shared tokens"))
    val b = (100L to 105L)
      .map(i => (i, "totally different beta words entirely here"))
    val docs = (a ++ b).toDF("doc_id", "text")
    val sh = TextHashing.shingleSetsRaw(docs).localCheckpoint(eager = true)
    // engineered band table: band 0 collides BOTH clusters into one hot
    // bucket (size 12); band 1 gives each cluster its own cold bucket
    // (size 6) — the multi-band recovery path the guard's tradeoff
    // relies on.
    val bt = docs
      .select(col("doc_id"), lit(0).as("band"), lit("HOT").as("sig"))
      .union(docs.select(col("doc_id"), lit(1).as("band"),
        when(col("doc_id") < 50L, "A").otherwise("B").as("sig")))
      .localCheckpoint(eager = true)
    def comps(threshold: Long): Map[Long, Long] = {
      val pairs = TextHashing.candidatePairsFromBands(
        graft.functions.Materialized(bt), threshold)
      val verified = TextHashing.jaccardOnCandidates(sh,
          graft.functions.Materialized(pairs))
        .filter(col("jaccard") >= 0.7)
        .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      TextHashing.connectedComponents(docs.select("doc_id"),
        graft.functions.Materialized(verified))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val guarded = comps(8L) // hot bucket 12 > 8; per-cluster buckets 6 <= 8
    val brute = comps(Long.MaxValue)
    assert(guarded === brute,
      s"star-collapsing the shared hot bucket must not merge or fragment " +
        s"the clusters the cold bands recover: $guarded vs $brute")
    assert(guarded.values.toSet === Set(0L, 100L),
      s"expected exactly the two engineered clusters: $guarded")
  }

  test("guard's max-bucket probe is memoized per (session, plan, keys) and cleared by Staged.reset (r13 ADVICE)") {
    TextHashing.clearProbeMemoAll()
    val docs = (0L until 20L).map(i => (i, s"w$i a b c d"))
      .toDF("doc_id", "text")
    val bt = TextHashing.lshBandsFrom(TextHashing.shingleSetsRaw(docs))
      .localCheckpoint(eager = true)
    val m = graft.functions.Materialized(bt)
    assert(TextHashing.probeMemoSize === 0)
    TextHashing.candidatePairsFromBands(m)
    assert(TextHashing.probeMemoSize === 1)
    // a second construction over the SAME plan (any threshold) reuses the
    // memoized probe instead of re-running the aggregate
    TextHashing.candidatePairsFromBands(m, hotBucketThreshold = 123L)
    assert(TextHashing.probeMemoSize === 1)
    // ...and the reset every bench pass already performs clears it
    operators.Staged.reset(spark)
    assert(TextHashing.probeMemoSize === 0)
  }

  test("property: incremental contraction equals the full closure on random graph growth (r15)") {
    // ground truth by driver union-find (smallest-id roots)
    def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (c != r) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
      }
      (0L until n.toLong).map(v => v -> find(v)).toMap
    }
    val caseGen = for {
      nOld <- Gen.chooseNum(2, 12)
      nNew <- Gen.chooseNum(1, 6)
      // base edges among old vertices only (the prior world)
      baseE <- Gen.listOf(for {
        a <- Gen.chooseNum(0, nOld - 1); b <- Gen.chooseNum(0, nOld - 1)
      } yield (a.toLong, b.toLong)).map(_.filter(e => e._1 != e._2).take(20))
      // delta edges: each touches at least one NEW vertex (the appendable
      // invariant — old×old pairs cannot appear in an append)
      deltaE <- Gen.listOf(for {
        a <- Gen.chooseNum(nOld, nOld + nNew - 1)
        b <- Gen.chooseNum(0, nOld + nNew - 1)
      } yield (a.toLong, b.toLong)).map(_.filter(e => e._1 != e._2).take(12))
    } yield (nOld, nNew, baseE, deltaE)
    val prop = Prop.forAll(caseGen) { case (nOld, nNew, baseE, deltaE) =>
      val n = nOld + nNew
      val prior = unionFind(nOld, baseE).toSeq
        .toDF("doc_id", "component")
      val newIds = (nOld.toLong until n.toLong).toDF("doc_id")
      val grownEdges = (baseE ++ deltaE).toDF("src", "dst")
      val got = TextHashing
        .incrementalComponents(prior, newIds, grownEdges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = unionFind(n, baseE ++ deltaE)
      got == want
    }
    val params = SCTest.Parameters.default.withMinSuccessfulTests(25)
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  test("minhash estimate invariant: every banded candidate agrees on at least one full band (r15)") {
    import org.apache.spark.sql.functions.col
    // a candidate pair exists BECAUSE some (band, sig) matched, and a
    // matching band means all rowsPerBand of its minhash slots agree —
    // so est_match ∈ [rowsPerBand, n] for every emitted pair. Exact
    // identical docs must score the full n.
    operators.Staged.reset(spark)
    val est = SparkEntry.queries("dedup_minhash_estimate")(spark, TestSpark.sf)
      .localCheckpoint(eager = true)
    assert(est.count() > 0, "the test corpus must produce candidates")
    assert(est.filter(col("est_match") < 4 || col("est_match") > 16)
      .count() === 0,
      "a banded candidate must agree on at least one full band (4 slots)")
    // the corpus' exact-duplicate clusters (dedup_exact finds them) score
    // the full 16/16
    assert(est.filter(col("est_match") === 16).count() > 0,
      "exact duplicates must score a full signature match")
    operators.Staged.reset(spark)
  }
}
