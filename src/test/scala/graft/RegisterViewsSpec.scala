package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SQL-first user surface: every table registered as a view, custom
  * functions injected by GraftExtensions, plain spark.sql drives both. */
class RegisterViewsSpec extends AnyFunSuite {
  import TestSpark._

  test("registerViews exposes every table to spark.sql") {
    Tables.registerViews(spark, sf)
    for (name <- Tables.all.keys)
      assert(spark.sql(s"SELECT * FROM $name LIMIT 1").count() === 1,
        s"view $name not queryable")
  }

  test("custom functions compose with the registered views in one SQL query") {
    Tables.registerViews(spark, sf)
    // events' ts survives the nanos conversion (usable as a timestamp),
    // and vec_dot/word_ngrams run straight from SQL over the views
    val r = spark.sql("""
      SELECT e.vec_id,
             vec_dot(CAST(e.embedding AS ARRAY<DOUBLE>),
                     CAST(e.embedding AS ARRAY<DOUBLE>)) AS sq_norm,
             size(word_ngrams(split(d.text, ' '), 2)) AS n_grams
      FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
      WHERE e.vec_id < 5""").collect()
    assert(r.length === 5)
    assert(r.forall(_.getAs[Double]("sq_norm") > 0.0))
    assert(r.forall(_.getAs[Int]("n_grams") >= 1))
    assert(spark.sql(
      "SELECT count(*) FROM events WHERE ts > timestamp'2000-01-01'")
      .head().getLong(0) > 0)
  }
}
