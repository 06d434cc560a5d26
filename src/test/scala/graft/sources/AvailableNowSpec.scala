package graft.sources

import java.nio.file.Files

import graft.TestSpark
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Trigger.AvailableNow over the replay-mode source: process everything
  * currently in the log in paced batches, then stop on its own — the
  * batch-ish operational mode for reprocessing a recorded feed. */
class AvailableNowSpec extends AnyFunSuite {
  import TestSpark.spark

  test("replay mode drains the log under Trigger.AvailableNow and stops") {
    val frames = (0 until 7).map(i => s"""{"i": $i}""")
    val log = Files.createTempFile("an_frames", ".jsonl")
    Files.write(log, frames.asJava)
    var batches = 0
    val q = spark.readStream
      .format("graft.sources.WebsocketSource")
      .option("replayFile", log.toString)
      .option("maxFramesPerTrigger", "3")
      .load()
      .writeStream
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        if (b.count() > 0) batches += 1
        ()
      }
      .start()
    assert(q.awaitTermination(60000), "query did not self-terminate")
    assert(batches === 3, s"expected 3 paced batches (3+3+1), got $batches")
  }
}
