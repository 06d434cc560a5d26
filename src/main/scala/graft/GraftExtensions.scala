package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Session-extension entry point — the production wiring for the engine's
  * custom Catalyst surface (SURVEY §4.3):
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * Every session built with this config gets the engine's codegen
  * expressions — `vec_dot` (vector dot product), `char_ngrams` and
  * `word_ngrams` (n-gram generation) — in its function registry at build
  * time; no runtime `register` calls needed. The test harness builds its
  * session through this class, so the injection path is what the whole
  * suite exercises. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    functions.VectorExprs.inject(ext)
    functions.NgramExprs.inject(ext)
  }
}
