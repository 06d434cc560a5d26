package graft.sources

import java.io.{InputStream, OutputStream}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import java.util.concurrent.{ConcurrentLinkedQueue, LinkedBlockingQueue, TimeUnit}

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Minimal in-process RFC 6455 websocket server: accepts upgrades, sends
  * queued text frames, never reads client frames (subscribes sit in the
  * TCP buffer). Frames are a shared feed — like a live exchange, a frame
  * is sent to whichever connection is active when it reaches the head of
  * the queue, and is gone once sent. `kill()` hard-closes the active
  * connection to exercise client reconnect. */
private class WsTestServer {
  private val server = new ServerSocket(0)
  def port: Int = server.getLocalPort
  def url: String = s"ws://127.0.0.1:$port/"

  private val pending = new LinkedBlockingQueue[String]()
  @volatile private var closed = false
  @volatile private var active: Socket = _

  def push(frames: Seq[String]): Unit = frames.foreach(pending.put)

  /** Hard-close the live connection (simulates a feed drop). */
  def kill(): Unit = {
    val s = active
    if (s != null) s.close()
  }

  def close(): Unit = {
    closed = true
    kill()
    server.close()
  }

  private def readHeaders(in: InputStream): String = {
    val sb = new StringBuilder
    var last4 = ""
    while (last4 != "\r\n\r\n") {
      val b = in.read()
      if (b < 0) return sb.toString()
      sb.append(b.toChar)
      last4 = sb.takeRight(4).toString()
    }
    sb.toString()
  }

  private def writeTextFrame(out: OutputStream, text: String): Unit = {
    val payload = text.getBytes(UTF_8)
    require(payload.length < 126, "test frames must stay under 126 bytes")
    out.write(Array[Byte](0x81.toByte, payload.length.toByte))
    out.write(payload)
    out.flush()
  }

  private def handle(sock: Socket): Unit = {
    val in = sock.getInputStream
    val out = sock.getOutputStream
    val headers = readHeaders(in)
    val key = headers.linesIterator
      .find(_.toLowerCase.startsWith("sec-websocket-key:"))
      .map(_.split(":", 2)(1).trim)
      .getOrElse(throw new IllegalStateException("no websocket key"))
    val accept = java.util.Base64.getEncoder.encodeToString(
      java.security.MessageDigest.getInstance("SHA-1").digest(
        (key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11").getBytes(UTF_8)))
    out.write(("HTTP/1.1 101 Switching Protocols\r\n" +
      "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
      s"Sec-WebSocket-Accept: $accept\r\n\r\n").getBytes(UTF_8))
    out.flush()
    active = sock
    // Watch the inbound side: the JDK client sends a Close frame (then TCP
    // FIN) on stop — without reading we'd keep draining the shared feed
    // into a dead socket and lose frames meant for the next connection.
    val reader = new Thread(() => {
      try { while (in.read() >= 0) () } catch { case _: Exception => () }
      finally { try sock.close() catch { case _: Exception => () } }
    }, "ws-test-reader")
    reader.setDaemon(true)
    reader.start()
    while (!closed && !sock.isClosed) {
      val f = pending.poll(50, TimeUnit.MILLISECONDS)
      if (f != null) {
        if (sock.isClosed) pending.putFirst(f)
        else try writeTextFrame(out, f)
        catch { case e: Exception => pending.putFirst(f); throw e }
      }
    }
  }

  private val acceptLoop = new Thread(() => {
    while (!closed) {
      try {
        val sock = server.accept()
        val t = new Thread(() => {
          try handle(sock)
          catch { case _: Exception => () }
          finally { try sock.close() catch { case _: Exception => () } }
        }, "ws-test-conn")
        t.setDaemon(true)
        t.start()
      } catch { case _: Exception => () }
    }
  }, "ws-test-accept")
  acceptLoop.setDaemon(true)
  acceptLoop.start()

  // putFirst needs a deque
  private implicit class DequeOps(q: LinkedBlockingQueue[String]) {
    def putFirst(s: String): Unit = {
      val rest = new java.util.ArrayList[String]()
      q.drainTo(rest)
      q.put(s)
      rest.asScala.foreach(q.put)
    }
  }
}

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
}
