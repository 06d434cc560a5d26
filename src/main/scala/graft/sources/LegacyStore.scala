package graft.sources

import java.sql.DriverManager

import graft.model.EngineOut
import graft.streaming.{BookEngine, Pipeline}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Legacy relational store (reference ops 4/5's SQLite surface,
  * db_utils.py:17-32 scan / 47-60 insert): the optional JDBC path SURVEY
  * §2.4 maps those ops to. The canonical store is parquet
  * ([[Pipeline.commitBatch]]); this adapter exists for deployments that
  * still need rows in a SQL database — tested against the Derby engine
  * that ships with Spark (in-memory URL), works against any JDBC server.
  *
  * Scale + semantics notes:
  *   - The reference opened one connection and one INSERT per row
  *     (db_utils.py:47-60); here a micro-batch is ONE `df.write.jdbc`
  *     (executors write partitions concurrently, batched statements).
  *   - foreachBatch is at-least-once, and plain JDBC append would
  *     duplicate rows on batch retry. [[writeBatch]] is the JDBC analogue
  *     of the parquet sink's dynamic partition overwrite: tag rows with
  *     batch_id, transactionally DELETE the batch's rows, then append —
  *     a retried batch replaces exactly itself (table-level idempotence).
  *   - [[readPartitioned]] is the scale path for reading a big legacy
  *     table back: predicate-ranged parallel scans via partitionColumn,
  *     not one driver-side cursor.
  */
object LegacyStore {

  /** Append `df` tagged with batch_id, idempotently: delete any rows of a
    * previous attempt of the same batch first (no-op when the table does
    * not exist yet — the first write creates it). */
  def writeBatch(df: DataFrame, url: String, table: String,
      batchId: Long): Unit = {
    deleteBatch(url, table, batchId)
    df.withColumn("batch_id", lit(batchId))
      .write.mode("append").jdbc(url, table, new java.util.Properties)
  }

  /** Driver-side transactional delete of one batch's rows; swallows only
    * the missing-table error so the first-ever write can proceed. */
  private def deleteBatch(url: String, table: String, batchId: Long): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      // Spark's JDBC writer creates columns with QUOTED (case-preserved)
      // identifiers, so the predicate must quote too — unquoted batch_id
      // would be uppercased by Derby and miss the column.
      val st = conn.prepareStatement(
        s"""DELETE FROM $table WHERE "batch_id" = ?""")
      st.setLong(1, batchId)
      st.executeUpdate()
      st.close()
    } catch {
      case e: java.sql.SQLException
        if e.getSQLState != null && e.getSQLState.startsWith("42") => ()
      // 42X05 etc.: table/view does not exist — first write creates it
    } finally conn.close()
  }

  /** Whole-table scan (op 4's `SELECT * FROM gdax_order_book`). */
  def read(spark: SparkSession, url: String, table: String): DataFrame =
    spark.read.jdbc(url, table, new java.util.Properties)

  /** Parallel ranged scan over a numeric column — how a large legacy table
    * is actually read on a cluster: each executor issues its own
    * WHERE-bounded query instead of one driver cursor. */
  def readPartitioned(spark: SparkSession, url: String, table: String,
      partitionColumn: String, lower: Long, upper: Long,
      numPartitions: Int): DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lower, upper,
      numPartitions, new java.util.Properties)

  /** foreachBatch body mirroring [[Pipeline.commitBatch]] into JDBC: the
    * inside book lands as the legacy 32-column flat view (the reference's
    * gdax_order_book shape, gdax_schema.sql:8-41), trades id-deduped into
    * a trades table. Use as
    * `writeStream.foreachBatch(LegacyStore.jdbcSink(url))`. */
  def jdbcSink(url: String, bookTable: String = "gdax_order_book",
      tradeTable: String = "trades")
      : (Dataset[EngineOut], Long) => Unit = { (batch, batchId) =>
    batch.persist()
    try {
      val (books, trades) = BookEngine.split(batch)
      writeBatch(Pipeline.legacyFlatView(books.toDF()), url, bookTable,
        batchId)
      writeBatch(trades.dropDuplicates("exchange", "tradeId").toDF(),
        url, tradeTable, batchId)
    } finally { batch.unpersist(); () }
  }
}
