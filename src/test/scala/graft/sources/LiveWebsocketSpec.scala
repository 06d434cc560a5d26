package graft.sources

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Live-mode websocket source, end-to-end against a real (in-process)
  * websocket server: connect + subscribe, frame delivery through the full
  * micro-batch machinery, reconnect after a dropped connection, and
  * checkpoint restart after a fully-committed batch — the offset-
  * regression case (ADVICE r02): a fresh source instance must resume
  * pacing from the restored offset, not re-emit committed frames. */
class LiveWebsocketSpec extends AnyFunSuite {
  import TestSpark.spark

  private def drainTo(sink: ConcurrentLinkedQueue[(Long, String)],
      df: DataFrame): Unit = {
    val rows = df.collect()
    rows.foreach(r => sink.add((r.getLong(0), r.getString(1))))
  }

  private def awaitCount(sink: ConcurrentLinkedQueue[(Long, String)],
      n: Int, q: org.apache.spark.sql.streaming.StreamingQuery,
      timeoutMs: Long = 30000): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (sink.size < n && System.currentTimeMillis() < deadline) {
      q.exception.foreach(e => fail("query died: " + e.cause, e))
      Thread.sleep(100)
    }
    assert(sink.size >= n, s"timed out waiting for $n frames, got ${sink.size}")
  }

  test("live mode: delivery, reconnect after drop, and restart without re-emission") {
    val server = new WsTestServer
    val ckpt = Files.createTempDirectory("live_ws_ckpt").toString
    try {
      val batch1 = (0 until 5).map(i => s"""{"seq": $i}""")
      server.push(batch1)

      val got1 = new ConcurrentLinkedQueue[(Long, String)]()
      val q1 = spark.readStream
        .format("graft.sources.WebsocketSource")
        .option("url", server.url)
        .option("subscribe", """{"type":"subscribe"}""")
        .option("maxFramesPerTrigger", "2")
        .load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, _: Long) => drainTo(got1, b) }
        .start()
      awaitCount(got1, 3, q1)
      // drop the connection mid-feed: the client must reconnect (backoff
      // starts at 1s) and the remaining frames flow on the new socket
      server.kill()
      server.push(Seq("""{"seq": 5}"""))
      awaitCount(got1, 6, q1)
      q1.processAllAvailable() // commit everything delivered
      q1.stop()
      assert(got1.asScala.map(_._2).toSet ===
        (batch1 :+ """{"seq": 5}""").toSet)
      val offsets1 = got1.asScala.map(_._1).toSeq.sorted
      assert(offsets1 === (0L until 6L), s"offsets not dense: $offsets1")

      // feed moves on while the query is down
      val batch2 = (6 until 9).map(i => s"""{"seq": $i}""")
      server.push(batch2)

      // restart from the checkpoint: last batch was FULLY committed, so a
      // regressed latestOffset would re-emit frames 0..5 here
      val got2 = new ConcurrentLinkedQueue[(Long, String)]()
      val q2 = spark.readStream
        .format("graft.sources.WebsocketSource")
        .option("url", server.url)
        .option("subscribe", """{"type":"subscribe"}""")
        .option("maxFramesPerTrigger", "2")
        .load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, _: Long) => drainTo(got2, b) }
        .start()
      awaitCount(got2, 3, q2)
      q2.processAllAvailable()
      q2.stop()
      assert(got2.asScala.map(_._2).toSet === batch2.toSet,
        "restart must deliver exactly the new frames — no re-emission, no loss")
      // offsets continue after the committed prefix
      assert(got2.asScala.map(_._1).toSeq.sorted === (6L until 9L))
    } finally server.close()
  }

  test("live mode over TLS (wss): real handshake against a test-scoped CA, frames flow") {
    // Both real endpoints were wss (real_guac_async.py:22,
    // polo_ws_async.py:26); this drives the TLS branch end-to-end: a
    // self-signed server cert (generated with the JDK's own keytool, test
    // scope only) served by an SSL-wrapped WsTestServer, trusted by the
    // source via its `truststore` option — verification stays ON, which is
    // the point: a wrong CA must fail the handshake, not silently connect.
    val dir = Files.createTempDirectory("ws_tls")
    val ks = s"$dir/server.p12"
    val cer = s"$dir/server.cer"
    val ts = s"$dir/trust.p12"
    def keytool(args: String*): Unit = {
      val bin = s"${System.getProperty("java.home")}/bin/keytool"
      val p = new ProcessBuilder((bin +: args).asJava)
        .redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes())
      assert(p.waitFor() === 0, s"keytool ${args.head} failed: $out")
    }
    keytool("-genkeypair", "-alias", "ws", "-keyalg", "RSA",
      "-keysize", "2048", "-storetype", "PKCS12", "-keystore", ks,
      "-storepass", "changeit", "-dname", "CN=127.0.0.1",
      "-validity", "2", "-ext", "san=ip:127.0.0.1")
    keytool("-exportcert", "-alias", "ws", "-keystore", ks,
      "-storepass", "changeit", "-file", cer)
    keytool("-importcert", "-noprompt", "-alias", "ws", "-file", cer,
      "-storetype", "PKCS12", "-keystore", ts, "-storepass", "changeit")

    val server = new WsTestServer(keystore = Some((ks, "changeit")))
    assert(server.url.startsWith("wss://"))
    val ckpt = Files.createTempDirectory("live_wss_ckpt").toString
    try {
      val frames = (0 until 4).map(i => s"""{"seq": $i}""")
      server.push(frames)
      val got = new ConcurrentLinkedQueue[(Long, String)]()
      val q = spark.readStream
        .format("graft.sources.WebsocketSource")
        .option("url", server.url)
        .option("subscribe", """{"type":"subscribe"}""")
        .option("truststore", ts)
        .option("truststorePassword", "changeit")
        .load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, _: Long) => drainTo(got, b) }
        .start()
      awaitCount(got, 4, q)
      q.processAllAvailable()
      q.stop()
      assert(got.asScala.map(_._2).toSet === frames.toSet)
      assert(got.asScala.map(_._1).toSeq.sorted === (0L until 4L))
    } finally server.close()
  }
}
