package graft.streaming

import org.apache.spark.sql.SparkSession

/** DDL migrator (reference op 7: db_utils.py:34-45 applying
  * schema/gdax_schema.sql + polo_schema.sql) — realized as idempotent
  * catalog registration over the parquet sink directories.
  *
  * Deliberately NOT replicated: the reference's migration scripts
  * `DROP TABLE IF EXISTS` and its worker re-runs them on every restart
  * (SURVEY §0.1 #4) — every restart destroyed all collected data. Here
  * `CREATE TABLE IF NOT EXISTS` is a no-op when the table exists; data
  * files are never touched.
  */
object Migrator {

  /** Register the two sink tables for an exchange under
    * `<exchange>_inside_book` / `<exchange>_trades` (mirroring the
    * reference's {gdax,polo}_order_book / {gdax,polo}_trades naming),
    * pointing at the Pipeline's parquet output. Safe to call on every
    * startup, INCLUDING before the first micro-batch has committed: a
    * location with no parquet files yet has no schema to infer (and no
    * partitions to recover), so registration is deferred — call again
    * after data lands (each sink path is skipped independently). Returns
    * the tables actually registered this call. */
  def ensureTables(spark: SparkSession, exchange: String,
      outDir: String): Seq[String] = {
    val conf = spark.sessionState.newHadoopConf()
    // Spark's file index ignores _/.-prefixed paths, so a part file under
    // an in-flight _temporary dir must not count as data — CREATE TABLE
    // over only-temporary files still fails schema inference.
    def visibleUnder(base: org.apache.hadoop.fs.Path,
        p: org.apache.hadoop.fs.Path): Boolean = {
      var cur = p
      while (cur != null && cur != base) {
        val n = cur.getName
        if (n.startsWith("_") || n.startsWith(".")) return false
        cur = cur.getParent
      }
      true
    }
    def hasParquet(location: String): Boolean =
      try {
        val p = new org.apache.hadoop.fs.Path(location)
        val fs = p.getFileSystem(conf)
        val qualified = fs.makeQualified(p)
        fs.exists(qualified) && {
          val it = fs.listFiles(qualified, true)
          var found = false
          while (!found && it.hasNext) {
            val f = it.next().getPath
            found = f.getName.endsWith(".parquet") &&
              visibleUnder(qualified, f)
          }
          found
        }
      } catch {
        case scala.util.control.NonFatal(e) =>
          // deferral must be visible: a permanent FS failure (bad URI,
          // credentials) must not silently read as "no data yet"
          org.slf4j.LoggerFactory.getLogger(getClass)
            .warn(s"Migrator: cannot probe $location, deferring: $e")
          false
      }
    Seq(s"${exchange}_inside_book" -> s"$outDir/inside_book",
        s"${exchange}_trades" -> s"$outDir/trades").collect {
      case (table, location) if hasParquet(location) =>
        spark.sql(
          s"CREATE TABLE IF NOT EXISTS $table USING PARQUET LOCATION '$location'")
        // The sinks write batch_id=N partitions; recover them into the
        // catalog (idempotent). A live deployment queries the path directly
        // (always current) or repairs on a schedule; the catalog entry is
        // the discoverability/BI surface.
        spark.sql(s"MSCK REPAIR TABLE $table")
        table
    }
  }
}
