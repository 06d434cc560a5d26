package graft.streaming

import graft.model.{EngineOut, MarketMessage}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** End-to-end wiring (SURVEY §3.1-3.3 Spark shape): frame stream → decoder
  * → stateful engine → parquet sinks, plus the legacy flat view and CSV
  * export (reference ops 5, 7, 8).
  *
  * The reference's Redis/arq process boundary dissolves into the
  * micro-batch boundary (§1.1): one foreachBatch commit per trigger writes
  * both tables — no per-row connections, no external queue.
  */
object Pipeline {

  /** Legacy flat view of the inside book (schema/gdax_schema.sql:8-41):
    * server_datetime (stamped at view/write time, as the reference stamped
    * emission time — real_guac_async.py:100), product_id, bids_1..15,
    * asks_1..15 with "volume@price" cells, null-padded to exactly 15 per
    * side (SURVEY §0.1 #6 fixed) — plus exchange and sequence, which the
    * reference encoded in the table NAME and dropped respectively. */
  def legacyFlatView(books: DataFrame): DataFrame = {
    val cells =
      (1 to 15).map(i => expr(
        s"""CASE WHEN size(bids) >= $i
            THEN concat(bids[${i - 1}].size, '@', bids[${i - 1}].price)
            END""").as(s"bids_$i")) ++
      (1 to 15).map(i => expr(
        s"""CASE WHEN size(asks) >= $i
            THEN concat(asks[${i - 1}].size, '@', asks[${i - 1}].price)
            END""").as(s"asks_$i"))
    books.select(
      (Seq(current_timestamp().as("server_datetime"), col("exchange"),
        col("productId").as("product_id"), col("sequence")) ++ cells): _*)
  }

  /** Trade-id dedup with the CORRECT key: exchange trade ids are
    * per-product counters (an ETH-USD id can equal an ETH-EUR id), so the
    * key is (exchange, productId, tradeId); the id-less sentinel rows
    * (tradeId = -1, e.g. truncated frames the decoder salvaged) extend the
    * key with a content surrogate — distinct salvaged trades never
    * collapse, exact replays still dedup. One pass over the input (no
    * filter/union plan duplication). */
  private[graft] def dedupTradeIds(
      trades: Dataset[graft.model.TradeOut]): Dataset[graft.model.TradeOut] =
    trades
      .withColumn("__idless_key",
        when(col("tradeId") === -1L,
          // exchangeTs is part of the surrogate: two distinct salvaged
          // trades with EQUAL fills in the same frame/sequence (routine —
          // two identical partial fills) must not collapse. Residual limit:
          // identical fills in the same sequence at the same exchange
          // timestamp still collapse — the decoded row carries no
          // arrival-order column to break that tie.
          concat_ws("|", col("sequence"), unix_micros(col("exchangeTs")),
            col("price"), col("volume"), col("side")))
          .otherwise(lit("")))
      .dropDuplicates(StateSchemas.TradeDedupKey)
      .drop("__idless_key")
      .as[graft.model.TradeOut](
        org.apache.spark.sql.Encoders.product[graft.model.TradeOut])

  /** Start the ingest pipeline for one exchange feed: a single stateful
    * pass whose micro-batches write to `<outDir>/inside_book` and
    * `<outDir>/trades` (trade rows deduped by id within each batch —
    * replayed frames can't double-insert, fixing §0.1's backfill
    * duplication for free).
    *
    * Sink idempotence: foreachBatch is at-least-once — a batch that fails
    * after a partial write is retried with the SAME batchId. Each write is
    * therefore partitioned by batch_id with dynamic partition overwrite:
    * the retry replaces exactly its own partition, never duplicating or
    * touching earlier batches — exactly-once at the table level.
    *
    * `useTransformWithState` switches the engine to the
    * transformWithState/RocksDB path (the production state backend for
    * large key × large book regimes) — the caller's session must set
    * `spark.sql.streaming.stateStore.providerClass` to the RocksDB
    * provider first; the default flatMapGroupsWithState path runs on any
    * provider and has a batch fallback. Both run the same pure processKey
    * core (golden-tested against each other). */
  def start(frames: DataFrame, decode: DataFrame => Dataset[MarketMessage],
      outDir: String, checkpointDir: String,
      fetcher: Option[graft.sources.Backfill.TradeFetcher] = None,
      useTransformWithState: Boolean = false,
      trigger: Option[org.apache.spark.sql.streaming.Trigger] = None,
      idleTtl: Option[java.time.Duration] = None): StreamingQuery = {
    require(idleTtl.isEmpty || useTransformWithState,
      "idleTtl is a transformWithState feature (TTLConfig)")
    val engineOut =
      if (useTransformWithState) BookEngine.runTws(decode(frames), idleTtl)
      else BookEngine.run(decode(frames))
    val writer = engineOut
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[EngineOut], batchId: Long) =>
        commitBatch(batch, batchId, outDir, fetcher)
      }
    trigger.foreach(writer.trigger)
    writer.start()
  }

  /** One micro-batch commit — public so idempotence is directly testable:
    * re-running the same (batch, batchId) leaves the tables unchanged. */
  def commitBatch(batch: Dataset[EngineOut], batchId: Long, outDir: String,
      fetcher: Option[graft.sources.Backfill.TradeFetcher]): Unit = {
    // Two sink writes (plus reconcileBatch's collect) each re-run the
    // decode + stateful pass unless the batch is pinned first.
    batch.persist()
    try {
      commitBatchInner(batch, batchId, outDir, fetcher)
    } finally batch.unpersist()
  }

  private def commitBatchInner(batch: Dataset[EngineOut], batchId: Long,
      outDir: String,
      fetcher: Option[graft.sources.Backfill.TradeFetcher]): Unit = {
    val spark = batch.sparkSession
    val (books, trades) = BookEngine.split(batch)
    books.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(s"$outDir/inside_book")
    val merged = fetcher match {
      case Some(f) => // op 22-23: fill flagged gaps, merge, dedup
        graft.sources.Backfill.reconcileBatch(spark, trades, f)
      case None => dedupTradeIds(trades)
    }
    merged.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(s"$outDir/trades")
    ()
  }

  /** Full-table CSV export with header (op 8, export_to_csv.py intent —
    * the reference's version crashed on an un-awaited coroutine,
    * SURVEY §0.1 #1). */
  def exportCsv(spark: SparkSession, tableDir: String, out: String): Unit =
    spark.read.parquet(tableDir)
      .write.mode("overwrite").option("header", "true").csv(out)

  /** Small-file compaction for a batch_id-partitioned sink table: every
    * micro-batch commit writes one file per shuffle partition per trigger,
    * and at feed rates that means millions of tiny files per day — the
    * classic streaming-sink operational failure at scale. Rewrites each
    * batch_id partition into one file (hash-clustered so a partition's
    * rows land in a single task) via dynamic partition overwrite — the
    * same idempotent mechanism as the sink itself, so a crashed compaction
    * is simply re-run.
    *
    * `upToBatchId` bounds the rewrite to partitions the stream has moved
    * past: a live deployment passes lastCommittedBatch - 1 so compaction
    * can never race the sink's own retry of the ACTIVE partition (two
    * writers interleaving delete/rename in one directory is exactly the
    * corruption the batch_id isolation exists to prevent). The default
    * rewrites everything — only safe for a stopped or offline table.
    *
    * The table is materialized (lineage cut) before the overwrite because
    * Spark refuses to overwrite a path it is still reading from; on a real
    * cluster with huge partitions, write to a temp location and rename
    * instead. */
  def compact(spark: SparkSession, tableDir: String,
      upToBatchId: Long = Long.MaxValue): Unit = {
    val all = spark.read.parquet(tableDir)
    require(all.columns.contains("batch_id"),
      s"$tableDir is not a batch_id-partitioned sink table")
    val df = all.filter(col("batch_id") <= upToBatchId)
    val nParts = df.select("batch_id").distinct().count().toInt.max(1)
    // checkpoint consumed within the call — released after the write
    // instead of lingering until the ContextCleaner
    val cut = df.repartition(nParts, col("batch_id"))
      .localCheckpoint(eager = true)
    try cut.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(tableDir)
    finally graft.functions.Materialized.unpersistCheckpoint(cut)
  }
}
