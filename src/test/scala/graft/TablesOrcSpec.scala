package graft

import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Format-flexible table loading (r14): every operator reads through
  * `Tables.table`, so a corpus landed as ORC — Spark's other native
  * columnar format — serves the whole query surface unchanged. Pinned by
  * running real operators over the SAME synthetic corpus written as
  * parquet and as ORC and requiring identical results, plus a pushdown
  * probe on the ORC scan. */
class TablesOrcSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def writeCorpus(dir: String, format: String): Unit = {
    val docs = (0L until 60L).map { i =>
      val text = s"alpha beta gamma delta tok$i tail${i % 7}"
      (i, text, "en", s"src${i % 3}", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val embs = (0L until 40L).map { i =>
      (i, Array.tabulate(64)(d => (((i * 17 + d * 5) % 11) - 5).toFloat / 5f),
        (i % 4).toInt)
    }.toDF("vec_id", "embedding", "label")
    docs.write.format(format).save(s"$dir/documents.$format")
    embs.write.format(format).save(s"$dir/embeddings.$format")
  }

  test("operators read an ORC corpus identically to the parquet one") {
    val pqDir = Files.createTempDirectory("tbl_pq").toString
    val orcDir = Files.createTempDirectory("tbl_orc").toString
    writeCorpus(pqDir, "parquet")
    writeCorpus(orcDir, "orc")
    val queries = Seq("vocab_topk", "ann_topk_brute", "domain_mixture",
      "text_token_count").filter(SparkEntry.queries.contains)
    for (q <- queries) {
      def run(dir: String): Seq[String] = {
        operators.Staged.reset(spark)
        SparkEntry.queries(q)(spark, dir)
          .collect().map(_.toString).sorted.toSeq
      }
      assert(run(orcDir) === run(pqDir), s"$q drifted between ORC and parquet")
    }
    operators.Staged.reset(spark)
  }

  test("ORC scans keep pushdown and pruning (the same Catalyst surface as parquet)") {
    val orcDir = Files.createTempDirectory("tbl_orc_push").toString
    writeCorpus(orcDir, "orc")
    val p = Tables.documents(spark, orcDir)
      .filter($"doc_id" > 10L).select("doc_id", "source")
      .queryExecution.executedPlan.toString
    assert(p.contains("FileScan orc"), p)
    assert(p.contains("PushedFilters: [") && !p.contains("PushedFilters: []"),
      "filter did not push to the ORC scan:\n" + p)
    val readSchema = "ReadSchema: [^\\n]*".r.findFirstIn(p).getOrElse("")
    assert(!readSchema.contains("text"),
      s"projection did not prune the ORC scan: $readSchema")
  }

  test("parquet stays primary when both formats are present") {
    val dir = Files.createTempDirectory("tbl_both").toString
    writeCorpus(dir, "parquet")
    // an ORC sibling with DIFFERENT content must be ignored
    (0L until 3L).map(i => (i, "zz", "en", "src0", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.format("orc").save(s"$dir/documents.orc")
    assert(Tables.documents(spark, dir).count() === 60L)
  }
}
