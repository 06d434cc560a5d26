package graft

import org.scalatest.funsuite.AnyFunSuite

/** The events loader's vintage contract (r11 ADVICE): the testdata regen
  * has already changed events.ts's physical type once (NANOS → µs, r10);
  * the loader must load every vintage it KNOWS identically and refuse —
  * loudly, at analysis time — any vintage it does not, rather than guess
  * an epoch unit and silently shift every timestamp. */
class TablesSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("events loads the current testdata with exact NTZ microsecond wall-clock") {
    val e = Tables.events(spark, sf)
    assert(e.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampNTZType)
    assert(e.count() > 0)
  }

  test("a UTC-adjusted timestamp vintage loads to the same wall-clock regardless of host zone") {
    // write an instant-typed (isAdjustedToUTC=true) copy of one NTZ value;
    // the loader's cast must render it at UTC because Tables.table pins
    // the session timezone — not at whatever the host exports
    val dir = java.nio.file.Files.createTempDirectory("ev_adj").toString
    // 1714557600000000 µs = 2024-05-01 10:00:00 UTC, built numerically so
    // no session-timezone interpretation sneaks into the test setup; the
    // INT96 default would write no annotation, so force timestamp[us]
    // (which Spark stamps isAdjustedToUTC=true)
    val prevOut = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try Seq(1L).toDF("event_id")
      .select(col("event_id"),
        timestamp_micros(lit(1714557600000000L)).as("ts"))
      .write.parquet(s"$dir/events.parquet")
    finally spark.conf.set("spark.sql.parquet.outputTimestampType", prevOut)
    val got = Tables.events(spark, dir)
      .select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
      .collect().head.getString(0)
    assert(got === "2024-05-01 10:00:00", s"adjusted vintage loaded shifted: $got")
  }

  test("an INT96 vintage (no annotation, but unambiguous instant semantics) loads exactly") {
    // legacy Spark/Hive writers default to INT96, which carries no
    // logical-type annotation; unlike a bare int64 its semantics are
    // fixed (UTC-adjusted instant), so the loader accepts it
    val dir = java.nio.file.Files.createTempDirectory("ev_i96").toString
    val prevOut = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    try Seq(1L).toDF("event_id")
      .select(col("event_id"),
        timestamp_micros(lit(1714557600000000L)).as("ts"))
      .write.parquet(s"$dir/events.parquet")
    finally spark.conf.set("spark.sql.parquet.outputTimestampType", prevOut)
    val got = Tables.events(spark, dir)
      .select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
      .collect().head.getString(0)
    assert(got === "2024-05-01 10:00:00", s"INT96 vintage loaded shifted: $got")
  }

  test("a non-UTC session timezone fails loudly instead of being silently rewritten") {
    // r12 ADVICE: the loader used to SET the session tz to UTC on every
    // read — a hidden global side effect clobbering any zone a caller
    // set mid-session. It now asserts; the mismatch must surface.
    val prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      val ex = intercept[IllegalArgumentException] {
        Tables.documents(spark, TestSpark.sf)
      }
      assert(ex.getMessage.contains("session.timeZone"), ex.getMessage)
      // equivalent spellings of UTC are accepted, not just the literal
      spark.conf.set("spark.sql.session.timeZone", "Etc/UTC")
      assert(Tables.documents(spark, TestSpark.sf).schema.nonEmpty)
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("an unrecognized vintage (plain int64, no annotation) fails loudly") {
    val dir = java.nio.file.Files.createTempDirectory("ev_bad").toString
    Seq((1L, 1714557600000000L)).toDF("event_id", "ts")
      .write.parquet(s"$dir/events.parquet")
    val ex = intercept[IllegalStateException] {
      Tables.events(spark, dir)
    }
    assert(ex.getMessage.contains("unrecognized events.ts vintage"),
      ex.getMessage)
  }
}
