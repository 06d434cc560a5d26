package graft.sources

import java.io.{InputStream, OutputStream}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.{LinkedBlockingQueue, TimeUnit}

import scala.jdk.CollectionConverters._

/** Minimal in-process RFC 6455 websocket server: accepts upgrades, sends
  * queued text frames, never reads client frames (subscribes sit in the
  * TCP buffer). Frames are a shared feed — like a live exchange, a frame
  * is sent to whichever connection is active when it reaches the head of
  * the queue, and is gone once sent. `kill()` hard-closes the active
  * connection to exercise client reconnect.
  *
  * `keystore` = (PKCS12 path, password) serves TLS instead of plaintext
  * (`wss://` url) — both real endpoints were wss, so the handshake branch
  * needs an in-process exerciser too. */
private[graft] class WsTestServer(keystore: Option[(String, String)] = None) {
  private val server: ServerSocket = keystore match {
    case Some((path, pass)) =>
      val ks = java.security.KeyStore.getInstance("PKCS12")
      val in = new java.io.FileInputStream(path)
      try ks.load(in, pass.toCharArray) finally in.close()
      val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
        javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
      kmf.init(ks, pass.toCharArray)
      val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
      ctx.init(kmf.getKeyManagers, null, null)
      ctx.getServerSocketFactory.createServerSocket(0)
    case None => new ServerSocket(0)
  }
  def port: Int = server.getLocalPort
  def url: String =
    s"${if (keystore.isDefined) "wss" else "ws"}://127.0.0.1:$port/"

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
    require(payload.length < 65536, "test frames must stay under 64 KiB")
    if (payload.length < 126)
      out.write(Array[Byte](0x81.toByte, payload.length.toByte))
    else
      out.write(Array[Byte](0x81.toByte, 126.toByte,
        ((payload.length >> 8) & 0xff).toByte, (payload.length & 0xff).toByte))
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

