package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch analogues of the reference's stateful/dataflow operators
  * (SURVEY.md §2.1), formulated as declarative window/join queries over the
  * driver testdata so Catalyst can optimize them and DuckDB can oracle-check
  * them. `events` proxies the trade stream: event_id ↔ trade_id, user_id ↔
  * product_id, ts ↔ exchange_ts (FIXTURES.md §C).
  *
  * Scale notes (100 TB): every query here is a single window or join over a
  * hash-partitionable key (`user_id`), so it parallelizes by key with one
  * shuffle; no driver-side state, no collect.
  */
object CoreQueries {

  /** Op 20 batch analogue (reference real_guac_async.py:123-132): per-key
    * monotone-id gap detection via lag window. */
  val gapDetect = QueryDef(
    "gap_detect",
    (spark, dir) => {
      import spark.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"event_id")
      Tables.events(spark, dir)
        .select($"user_id", $"event_id")
        .withColumn("prev_id", lag($"event_id", 1).over(w))
        .filter($"event_id" > $"prev_id" + 1)
        .select(
          $"user_id",
          $"prev_id".as("last_id"),
          $"event_id".as("next_id"),
          ($"event_id" - $"prev_id" - 1).as("n_missing"))
    },
    Some("""
      SELECT user_id, prev_id AS last_id, event_id AS next_id,
             event_id - prev_id - 1 AS n_missing
      FROM (
        SELECT user_id, event_id,
               lag(event_id) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_id
        FROM events)
      WHERE event_id > prev_id + 1
    """))

  /** Op 21 (redis_worker.py:45): missing-id range expansion via
    * sequence+explode. Bounded to gaps <= 100 ids (the reference's page size,
    * redis_worker.py:46) so the generated row count stays proportional to the
    * gap count at any scale. */
  val gapRanges = QueryDef(
    "gap_ranges",
    (spark, dir) => {
      import spark.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"event_id")
      Tables.events(spark, dir)
        .select($"user_id", $"event_id")
        .withColumn("prev_id", lag($"event_id", 1).over(w))
        .filter($"event_id" > $"prev_id" + 1 &&
          $"event_id" - $"prev_id" <= 101)
        .select($"user_id",
          explode(sequence($"prev_id" + 1, $"event_id" - 1)).as("missing_id"))
    },
    Some("""
      SELECT user_id,
             unnest(generate_series(prev_id + 1, event_id - 1)) AS missing_id
      FROM (
        SELECT user_id, event_id,
               lag(event_id) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_id
        FROM events)
      WHERE event_id > prev_id + 1 AND event_id - prev_id <= 101
    """))

  val defs: Seq[QueryDef] = Seq(gapDetect, gapRanges)
}
