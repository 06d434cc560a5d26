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
    // The testdata's timestamps are tz-naive wall-clock and the DuckDB
    // oracle is tz-naive throughout, so every instant <-> NTZ cast in the
    // loaders must happen at UTC — pin it rather than inherit whatever
    // the host happens to export (a UTC-adjusted timestamp[us] vintage
    // would otherwise load shifted by the local zone, silently).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** The parquet logical-type annotation of events.ts, read from the file
    * footer (metadata only, no Spark job; memoized per path). The
    * annotation is AUTHORITATIVE where the Spark-read dtype is ambiguous:
    * under nanosAsLong a TIMESTAMP(NANOS) column and a plain
    * annotation-less int64 both surface as LongType, and dividing a
    * micros epoch by 1000 would shift every timestamp 1000x with no
    * error — the exact regen hazard the r10 testdata drop demonstrated. */
  private val tsAnnotationCache =
    scala.collection.concurrent.TrieMap.empty[String, Option[(String, Boolean)]]
  private def eventsTsAnnotation(s: SparkSession, d: String)
      : Option[(String, Boolean)] = {
    val conf = s.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(s"$d/events.parquet")
    val fs = root.getFileSystem(conf)
    // driver testdata is a bare file; Spark-written tables (ScaleData
    // replicas) are directories of part files — one footer decides
    val file =
      if (fs.getFileStatus(root).isDirectory)
        fs.listStatus(root).map(_.getPath)
          .find(_.getName.endsWith(".parquet"))
          .getOrElse(throw new IllegalStateException(
            s"no parquet part files under $root"))
      else root
    // cache key includes the mtime: the driver regenerates testdata IN
    // PLACE between rounds, and a long-lived JVM (sbt server) must not
    // serve the previous drop's annotation for the new file
    val key = s"$file@${fs.getFileStatus(file).getModificationTime}"
    tsAnnotationCache.getOrElseUpdate(key, {
      import org.apache.parquet.schema.LogicalTypeAnnotation
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(file, conf))
      try {
        val schema = reader.getFileMetaData.getSchema
        val t = schema.getType(schema.getFieldIndex("ts"))
        t.asPrimitiveType().getLogicalTypeAnnotation match {
          case ann: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            Some((ann.getUnit.toString, ann.isAdjustedToUTC))
          case _ => None
        }
      } finally reader.close()
    })
  }

  /** Expose `ts` as µs-precision TIMESTAMP_NTZ regardless of how the datagen
    * wrote it. Earlier drops stamped NANOS(NTZ) parquet (read as raw Long
    * under nanosAsLong — truncation to µs is lossless, the datagen stamps
    * µs-aligned values); current drops stamp timestamp[us] which Spark reads
    * as TIMESTAMP_NTZ directly. The branch is keyed on BOTH the read dtype
    * and the footer annotation, and fails loudly on any vintage it does not
    * recognize — a regen that writes plain int64 epochs or a unit this
    * loader has never seen must break the build, not silently shift every
    * timestamp (r11 ADVICE). A UTC-adjusted vintage reads exactly because
    * [[table]] pins the session timezone to UTC. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.expr
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = table(s, d, "events")
    (raw.schema("ts").dataType, eventsTsAnnotation(s, d)) match {
      case (LongType, Some(("NANOS", _))) =>
        // an adjusted-to-UTC nanos instant and an NTZ nanos wall-clock
        // carry the same numeric at UTC, and the session tz is pinned
        raw.withColumn("ts", expr("CAST(timestamp_micros(ts div 1000) AS TIMESTAMP_NTZ)"))
      case (TimestampNTZType, _) => raw
      case (TimestampType, Some((_, true))) =>
        // UTC-adjusted micros/millis: Spark reads an instant; the cast
        // renders it at the pinned UTC session tz — no host-zone shift
        raw.withColumn("ts", expr("CAST(ts AS TIMESTAMP_NTZ)"))
      case (TimestampType, None) =>
        // INT96: no logical annotation by design, but its semantics are
        // unambiguous (a UTC-adjusted instant — legacy Spark/Hive
        // writers), so this is the one annotation-less shape that is
        // safe to load: same cast as the adjusted case, exact at the
        // pinned UTC session tz. (An annotation-less int64 still fails
        // below — THAT epoch unit would be a guess.)
        raw.withColumn("ts", expr("CAST(ts AS TIMESTAMP_NTZ)"))
      case (dt, ann) => throw new IllegalStateException(
        s"unrecognized events.ts vintage in $d: Spark dtype $dt, parquet " +
          s"annotation $ann — a testdata regen changed the physical " +
          "schema; refusing to guess the epoch unit (extend Tables.events)")
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
