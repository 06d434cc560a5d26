package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// scratch profiling main — delete before commit
object ProfileScratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $name%-32s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }

    val docs = Tables.documents(spark, sfDir)
    import graft.functions.TextHashing

    // ---- simhash_pairs breakdown ----
    time("simhash (fingerprints)") { TextHashing.simhash(docs).count() }
    time("simhash warm") { TextHashing.simhash(docs).count() }
    time("simhash_pairs full") { TextHashing.simhashPairs(docs).count() }
    time("simhash_pairs warm") { TextHashing.simhashPairs(docs).count() }

    // ---- components breakdown ----
    time("lsh cand pairs") { TextHashing.lshCandidatePairs(docs, 4, 4).count() }
    time("jaccard verify") {
      TextHashing.jaccard(docs, TextHashing.lshCandidatePairs(docs, 4, 4))
        .filter(col("jaccard") >= 0.7).count()
    }
    time("components full") {
      val edges = TextHashing
        .jaccard(docs, TextHashing.lshCandidatePairs(docs, 4, 4))
        .filter(col("jaccard") >= 0.7)
        .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      TextHashing.connectedComponents(docs.select("doc_id"), edges).count()
    }

    // ---- char_ngram_jaccard breakdown ----
    time("char grams explode+distinct") {
      docs.select(col("doc_id"),
        explode(array_distinct(expr(
          "transform(sequence(1, greatest(char_length(text) - 2, 1))," +
            " i -> substr(text, i, 3))"))).as("g")).count()
    }
    time("char_ngram_jaccard full") {
      operators.SqlSurfaceQueries.defs.find(_.name == "char_ngram_jaccard").get
        .fn(spark, sfDir).count()
    }

    // ---- ann breakdown ----
    time("ann_topk_brute") {
      operators.SimilarityQueries.defs.find(_.name == "ann_topk_brute").get
        .fn(spark, sfDir).count()
    }
    time("ann_topk_brute warm") {
      operators.SimilarityQueries.defs.find(_.name == "ann_topk_brute").get
        .fn(spark, sfDir).count()
    }
    time("book_replay") {
      operators.ReplayBench.defs.find(_.name == "book_replay").get
        .fn(spark, sfDir).count()
    }
    spark.stop()
  }
}
