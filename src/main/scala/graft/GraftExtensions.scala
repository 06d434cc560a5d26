package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Session-extension entry point — the production wiring for the engine's
  * custom Catalyst surface (SURVEY §4.3):
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * Every session built with this config gets `vec_dot` (the codegen'd
  * vector dot-product Expression) in its function registry at build time;
  * no runtime `VectorExprs.register` call needed. The test harness builds
  * its session through this class, so the injection path is what the whole
  * suite exercises. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    functions.VectorExprs.inject(ext)
}
