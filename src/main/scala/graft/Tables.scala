package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet testdata (TESTDATA.md).
  *
  * Every batch query in this engine takes `(SparkSession, sfDir)` and reads
  * only via these helpers, so filter pushdown / column pruning reach the
  * parquet scan unimpeded (plain `spark.read.parquet`, no caching layer).
  */
object Tables {
  // r21 optimization note: a blanket scan-side repartition (every
  // testdata table is one single-row-group parquet file, hence a
  // one-task scan) was implemented and A/B-measured this round — it
  // made 130 of 159 queries SLOWER (full-suite 2-pass legs: 188.8 s
  // with it + a 64k AQE coalesce floor vs 104.4 s without, same
  // sitting): at this scale most queries are scheduling-overhead-bound,
  // not CPU-bound, and multiplying task counts costs more than the
  // parallelism buys. The handful of genuinely CPU-bound operators pin
  // their own width at their heavy exchange instead (Staged.cpuWidth).
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized
    // reader rejects unless read as raw Long (nanos since epoch); the
    // events loader below converts back to a timestamp column.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The testdata's timestamps are tz-naive wall-clock and the DuckDB
    // oracle is tz-naive throughout, so every instant <-> NTZ cast in the
    // loaders must happen at UTC. Every entry point (Bench/Verify/specs/
    // the streaming mains) pins it at session construction; this loader
    // ASSERTS rather than silently rewrites — a caller that set another
    // zone mid-session must fail loudly, not have its setting clobbered
    // as a hidden read side effect (r12 ADVICE).
    val tz = spark.conf.get("spark.sql.session.timeZone")
    require(
      try java.time.ZoneId.of(tz).normalized() == java.time.ZoneOffset.UTC
      catch { case scala.util.control.NonFatal(_) => false },
      s"graft.Tables requires spark.sql.session.timeZone=UTC (got '$tz'): " +
        "set it at SparkSession construction — the testdata's wall-clock " +
        "timestamps and the DuckDB oracle are both tz-naive at UTC")
    val pq = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
    val fs = pq.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(pq)) spark.read.parquet(pq.toString)
    else {
      // Format-flexible loading: a corpus landed as ORC (the other
      // columnar format Spark reads natively) serves every operator
      // unchanged — all reads go through this one loader, and both
      // formats give Catalyst the same pushdown/pruning surface. Parquet
      // stays the primary (checked first, and the missing-table error
      // below keeps its message); `events` remains parquet-only because
      // its vintage disambiguation reads the parquet footer.
      val orc = new org.apache.hadoop.fs.Path(s"$dir/$name.orc")
      if (name == "events" && fs.exists(orc))
        // explicit, not a FileNotFound from the footer read later
        throw new IllegalStateException(
          s"events must be parquet (found $orc): Tables.events disambiguates " +
            "the timestamp vintage by reading the PARQUET footer annotation, " +
            "which an ORC corpus cannot provide")
      else if (fs.exists(orc)) spark.read.orc(orc.toString)
      else spark.read.parquet(pq.toString) // surface the standard error
    }
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
  /** Footer facts per events file: the ts logical-type annotation plus
    * the writer's `created_by` string (consulted by the INT96 branch). */
  private final case class TsFooter(annotation: Option[(String, Boolean)],
      createdBy: String)
  // keyed by PATH, storing (mtime, footer): the driver regenerates
  // testdata IN PLACE between rounds, so a long-lived JVM (sbt server)
  // must not serve the previous drop's footer — an mtime change REPLACES
  // the entry, so at most one entry per path survives (the r12-ADVICE
  // fix for the old mtime-in-key map that grew one dead entry per regen)
  private val tsFooterCache =
    scala.collection.concurrent.TrieMap.empty[String, (Long, TsFooter)]
  private def eventsTsFooter(s: SparkSession, d: String): TsFooter = {
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
    val mtime = fs.getFileStatus(file).getModificationTime
    tsFooterCache.get(file.toString) match {
      case Some((m, cached)) if m == mtime => cached
      case _ =>
        import org.apache.parquet.schema.LogicalTypeAnnotation
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(file, conf))
        val footer =
          try {
            val meta = reader.getFileMetaData
            val schema = meta.getSchema
            val t = schema.getType(schema.getFieldIndex("ts"))
            val ann = t.asPrimitiveType().getLogicalTypeAnnotation match {
              case a: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
                Some((a.getUnit.toString, a.isAdjustedToUTC))
              case _ => None
            }
            TsFooter(ann, Option(meta.getCreatedBy).getOrElse(""))
          } finally reader.close()
        tsFooterCache.put(file.toString, (mtime, footer))
        footer
    }
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
    // one footer fetch serves both the annotation match and the INT96
    // branch's created_by check — no second filesystem resolution
    val footer = eventsTsFooter(s, d)
    (raw.schema("ts").dataType, footer.annotation) match {
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
        // INT96: no logical annotation by design. For parquet-mr writers
        // (Spark/Hive legacy) the value is a UTC-adjusted instant, so the
        // cast is exact at the pinned UTC session tz — but Impala-written
        // INT96 stores LOCAL wall-clock and is only read correctly under
        // spark.sql.parquet.int96TimestampConversion, so accepting it
        // here would load shifted timestamps without error (r12 ADVICE).
        // Gate the annotation-less acceptance on the footer's created_by:
        // parquet-mr loads; anything else (impala, unknown) fails loudly.
        val createdBy = footer.createdBy
        if (!createdBy.toLowerCase(java.util.Locale.ROOT)
            .contains("parquet-mr")) throw new IllegalStateException(
          s"INT96 events.ts in $d written by '$createdBy': only parquet-mr " +
            "writers store UTC-adjusted INT96; an Impala-style local-time " +
            "INT96 would load shifted — refusing to guess")
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
