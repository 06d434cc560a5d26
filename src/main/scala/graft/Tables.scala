package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet testdata (TESTDATA.md).
  *
  * Every batch query in this engine takes `(SparkSession, sfDir)` and reads
  * only via these helpers, so filter pushdown / column pruning reach the
  * parquet scan unimpeded (plain `spark.read.parquet`, no caching layer).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized
    // reader rejects unless read as raw Long (nanos since epoch); the
    // events loader below converts back to a timestamp column.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** Expose `ts` as µs-precision TIMESTAMP_NTZ regardless of how the datagen
    * wrote it. Earlier drops stamped NANOS(NTZ) parquet (read as raw Long
    * under nanosAsLong — truncation to µs is lossless, the datagen stamps
    * µs-aligned values); current drops stamp timestamp[us] which Spark reads
    * as TIMESTAMP_NTZ directly. Branch on the read dtype so either vintage
    * of testdata loads identically. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.expr
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", expr("CAST(timestamp_micros(ts div 1000) AS TIMESTAMP_NTZ)"))
      case TimestampNTZType => raw
      case _ =>
        raw.withColumn("ts", expr("CAST(ts AS TIMESTAMP_NTZ)"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Every table loader by name — the one list [[registerViews]] and any
    * catalog-style consumer iterate. `events` goes through its typed
    * loader so the nanos quirk never leaks to SQL users. */
  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "region" -> region, "nation" -> nation, "customer" -> customer,
    "supplier" -> supplier, "part" -> part, "orders" -> orders,
    "lineitem" -> lineitem, "events" -> events _,
    "documents" -> documents, "embeddings" -> embeddings)

  /** SQL-first entry point: register every table as a temp view so a user
    * can drive the whole engine with `spark.sql(...)` — together with
    * [[GraftExtensions]] (the injected vec_dot / char_ngrams /
    * word_ngrams codegen expressions) this is the "switch your SQL over"
    * surface. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    all.foreach { case (name, load) =>
      load(spark, dir).createOrReplaceTempView(name)
    }
}
/** One named, oracle-checkable batch operator.
  *
  * @param oracle equivalent ANSI SQL for DuckDB over the same tables;
  *               None → the driver records a weaker rows-only check.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
