package graft.sources

import java.sql.Timestamp

import graft.TestSpark
import graft.model.MarketMessage
import graft.streaming.BookEngine
import org.scalatest.funsuite.AnyFunSuite

/** Legacy JDBC store round-trip (reference ops 4/5's SQLite surface,
  * db_utils.py:17-32 / 47-60) against the Derby engine that ships with
  * Spark: batch writes are idempotent under foreachBatch retry, the flat
  * book view and deduped trades land as SQL rows, and the partitioned
  * read path returns the same rows as the plain scan. */
class LegacyStoreSpec extends AnyFunSuite {
  import TestSpark.spark

  System.setProperty("derby.system.home",
    java.nio.file.Files.createTempDirectory("graft_derby").toString)
  private val url = "jdbc:derby:memory:graftlegacy;create=true"

  private def ts(s: Int) = Timestamp.valueOf(f"2017-10-15 05:10:$s%02d")

  private def engineBatch(ids: Seq[Long]) = {
    import spark.implicits._
    val msgs = Seq(
      MarketMessage("gdax", "BTC-USD", "snapshot", "BTC-USD", 1L, 1L,
        Seq(Seq("6000.00", "1.5"), Seq("5999.00", "2.0")),
        Seq(Seq("6001.00", "0.7")), Nil, -1L, "", "", "", ts(1)),
      MarketMessage("gdax", "BTC-USD", "l2update", "BTC-USD", 2L, 2L,
        Nil, Nil, Seq(Seq("buy", "6000.50", "0.3")), -1L, "", "", "", ts(2))
    ) ++ ids.zipWithIndex.map { case (id, i) =>
      MarketMessage("gdax", "BTC-USD", "match", "BTC-USD", 10L + i,
        10L + i, Nil, Nil, Nil, id, "6000.25", "0.1", "buy", ts(3))
    }
    BookEngine.run(msgs.toDS())
  }

  test("jdbcSink: idempotent batch replace, flat book + deduped trades round-trip") {
    val sink = LegacyStore.jdbcSink(url, "gdax_order_book", "trades")
    sink(engineBatch(Seq(100L, 101L, 101L)), 0L)
    sink(engineBatch(Seq(100L, 101L, 101L)), 0L) // foreachBatch retry
    val books = LegacyStore.read(spark, url, "gdax_order_book")
    val trades = LegacyStore.read(spark, url, "trades")
    // retry replaced, not duplicated; trade id 101 deduped within batch
    assert(trades.count() === 2)
    assert(books.columns.toSet.contains("bids_1") &&
      books.columns.toSet.contains("asks_15"))
    // two book emissions (snapshot + l2update), best bid updated by the l2
    val rows = books.collect().sortBy(_.getAs[Long]("sequence"))
    assert(rows.length === 2)
    assert(rows(0).getAs[String]("bids_1") === "1.5@6000.00")
    assert(rows(1).getAs[String]("bids_1") === "0.3@6000.50")

    // a second batch appends alongside the first
    sink(engineBatch(Seq(200L)), 1L)
    assert(LegacyStore.read(spark, url, "trades").count() === 3)
    assert(LegacyStore.read(spark, url, "trades")
      .where("batch_id = 0").count() === 2)
  }

  test("writeBatch: a delete failure on an EXISTING table propagates (no retry double-append)") {
    // The idempotence contract: only a genuinely missing table may skip the
    // delete. Here the table exists but lacks batch_id, so the DELETE fails
    // — swallowing that (the old blanket SQLState-42 catch) would append
    // anyway and double-insert on every foreachBatch retry.
    val conn = java.sql.DriverManager.getConnection(url)
    try conn.createStatement()
      .executeUpdate("CREATE TABLE no_batch_col (x INT)")
    finally conn.close()
    import spark.implicits._
    val df = Seq((1, "a")).toDF("x", "y")
    intercept[java.sql.SQLException] {
      LegacyStore.writeBatch(df, url, "no_batch_col", 0L)
    }
    // and nothing was appended by the failed batch
    assert(LegacyStore.read(spark, url, "no_batch_col").count() === 0)
  }

  test("writeBatch: a LIKE-wildcard sibling table does not shadow a missing one") {
    // getTables takes LIKE patterns: the '_' in wild_card matches WILDXCARD
    // too, so a pattern-trusting probe would report the table as existing
    // and the DELETE against the truly-missing WILD_CARD would fail the
    // first-ever write. tableExists deliberately avoids LIKE-pattern
    // escaping (non-portable across drivers — Derby included) and instead
    // post-filters the getTables result by exact TABLE_NAME equality, so
    // the sibling row is discarded, the probe says missing, and the first
    // write creates the table normally.
    val conn = java.sql.DriverManager.getConnection(url)
    try conn.createStatement()
      .executeUpdate("""CREATE TABLE wildxcard (x INT)""")
    finally conn.close()
    import spark.implicits._
    val df = Seq((1, "a")).toDF("x", "y")
    LegacyStore.writeBatch(df, url, "wild_card", 0L) // must not throw
    assert(LegacyStore.read(spark, url, "wild_card").count() === 1)
  }

  test("writeBatch: rejects table names outside the unquoted-identifier grammar") {
    import spark.implicits._
    val df = Seq((1, "a")).toDF("x", "y")
    intercept[IllegalArgumentException] {
      LegacyStore.writeBatch(df, url, """trades" WHERE 1=1; --""", 0L)
    }
  }

  test("readPartitioned: ranged parallel scan sees exactly the plain scan's rows") {
    val plain = LegacyStore.read(spark, url, "trades")
      .collect().map(_.getAs[Long]("tradeId")).sorted
    val ranged = LegacyStore.readPartitioned(spark, url, "trades",
      "tradeId", 0L, 300L, 4)
    assert(ranged.rdd.getNumPartitions === 4)
    assert(ranged.collect().map(_.getAs[Long]("tradeId")).sorted
      === plain)
  }
}
