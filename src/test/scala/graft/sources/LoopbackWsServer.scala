package graft.sources

import java.io.{InputStream, OutputStream}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.Base64
import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch}
import java.util.concurrent.atomic.AtomicInteger

/** Minimal RFC 6455 WebSocket SERVER on 127.0.0.1 — test infrastructure
  * that lets the REAL socket path of [[WebSocketFrameProvider]] (JDK
  * java.net.http.WebSocket client: handshake, masked client frames,
  * ping/pong, close, reconnect) run inside the zero-egress sandbox.
  * Speaks just enough of the protocol for the JDK client: the 101
  * upgrade with Sec-WebSocket-Accept, unmasked server text frames,
  * masked client frame parsing, pong replies, and close echo.
  *
  * Scripted per connection: on the client's first text frame (the
  * subscribe payload) it emits `onSubscribe(payload, connectionIndex)`
  * frames, then either holds the connection open or closes it
  * (`closeAfterServe`) to drive the provider's S4 reconnect loop.
  */
final class LoopbackWsServer(
    onSubscribe: (String, Int) => Seq[String],
    closeAfterServe: Boolean = false,
    maxConnections: Int = 8) {

  private val server = new ServerSocket(0, 8,
    java.net.InetAddress.getLoopbackAddress)
  val port: Int = server.getLocalPort
  def url: String = s"ws://127.0.0.1:$port/ws"

  val subscribesSeen = new ConcurrentLinkedQueue[String]()
  val pingsSeen = new AtomicInteger(0)
  val connectionsSeen = new AtomicInteger(0)
  val firstPing = new CountDownLatch(1)

  @volatile private var running = true
  private val acceptor = new Thread(() => {
    while (running && connectionsSeen.get() < maxConnections) {
      try {
        val sock = server.accept()
        val idx = connectionsSeen.getAndIncrement()
        new Thread(() => handle(sock, idx), s"loopback-ws-conn-$idx").start()
      } catch { case _: Throwable => /* closed */ }
    }
  }, "loopback-ws-acceptor")
  acceptor.setDaemon(true)
  acceptor.start()

  def close(): Unit = { running = false; server.close() }

  // ---------------------------------------------------------------- //

  private def handle(sock: Socket, idx: Int): Unit = {
    try {
      sock.setSoTimeout(15000)
      val in = sock.getInputStream
      val out = sock.getOutputStream
      handshake(in, out)
      var open = true
      while (open && running) {
        readMessage(in) match {
          case None => open = false
          case Some((opcode, payload)) => opcode match {
            case 0x1 => // text: the subscribe payload
              val text = new String(payload, UTF_8)
              subscribesSeen.add(text)
              onSubscribe(text, idx).foreach(f => writeFrame(out, 0x1, f.getBytes(UTF_8)))
              if (closeAfterServe) {
                writeFrame(out, 0x8, Array(0x03.toByte, 0xE8.toByte)) // 1000
                open = false
              }
            case 0x9 => // ping -> pong
              pingsSeen.incrementAndGet()
              firstPing.countDown()
              writeFrame(out, 0xA, payload)
            case 0x8 => // close -> echo and drop
              writeFrame(out, 0x8, payload)
              open = false
            case _ => // pong/continuation: ignore
          }
        }
      }
    } catch { case _: Throwable => /* connection torn down */ }
    finally { try sock.close() catch { case _: Throwable => } }
  }

  private def handshake(in: InputStream, out: OutputStream): Unit = {
    val req = new StringBuilder
    var prev = 0
    while (!req.endsWith("\r\n\r\n")) {
      val b = in.read()
      if (b < 0) throw new RuntimeException("eof during handshake")
      req.append(b.toChar); prev = b
    }
    val key = req.toString.linesIterator
      .find(_.toLowerCase.startsWith("sec-websocket-key:"))
      .map(_.split(":", 2)(1).trim)
      .getOrElse(throw new RuntimeException("no Sec-WebSocket-Key"))
    val accept = Base64.getEncoder.encodeToString(
      MessageDigest.getInstance("SHA-1").digest(
        (key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11").getBytes(UTF_8)))
    out.write(("HTTP/1.1 101 Switching Protocols\r\n" +
      "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
      s"Sec-WebSocket-Accept: $accept\r\n\r\n").getBytes(UTF_8))
    out.flush()
  }

  /** One complete client MESSAGE: (opcode, unmasked payload); None on
    * EOF. Reassembles fragmented data messages (FIN=0 initial frame +
    * 0x0 continuations) — the JDK WebSocket client may fragment a large
    * `sendText`, and dropping continuations would silently truncate the
    * recorded subscribe payload. Control frames (opcode ≥ 0x8) are never
    * fragmented (RFC 6455 §5.4/§5.5) and per the RFC MAY be interleaved
    * mid-fragmentation; this server has no scripted interleaving, so an
    * interleaved control frame fails loudly rather than being reordered.
    */
  private def readMessage(in: InputStream): Option[(Int, Array[Byte])] = {
    readFrame(in).flatMap { case (fin, opcode, payload) =>
      if (fin) Some((opcode, payload))
      else {
        require(opcode < 0x8, s"fragmented control frame (opcode $opcode)")
        val buf = new java.io.ByteArrayOutputStream()
        buf.write(payload)
        var done = false
        while (!done) {
          readFrame(in) match {
            case None => return None
            case Some((f, op, p)) =>
              require(op == 0x0,
                s"expected continuation mid-fragmentation, got opcode $op")
              buf.write(p)
              done = f
          }
        }
        Some((opcode, buf.toByteArray))
      }
    }
  }

  /** One client frame: (fin, opcode, unmasked payload); None on EOF. */
  private def readFrame(in: InputStream): Option[(Boolean, Int, Array[Byte])] = {
    val b0 = in.read()
    if (b0 < 0) return None
    val fin = (b0 & 0x80) != 0
    val opcode = b0 & 0x0f
    val b1 = in.read()
    if (b1 < 0) return None
    val masked = (b1 & 0x80) != 0
    var len: Long = b1 & 0x7f
    if (len == 126) len = (readN(in, 2) match { case a => ((a(0) & 0xffL) << 8) | (a(1) & 0xffL) })
    else if (len == 127) {
      val a = readN(in, 8)
      len = a.foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
    }
    val mask = if (masked) readN(in, 4) else Array.empty[Byte]
    val payload = readN(in, len.toInt)
    if (masked) {
      var i = 0
      while (i < payload.length) { payload(i) = (payload(i) ^ mask(i % 4)).toByte; i += 1 }
    }
    Some((fin, opcode, payload))
  }

  private def readN(in: InputStream, n: Int): Array[Byte] = {
    val a = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(a, off, n - off)
      if (r < 0) throw new RuntimeException("eof mid-frame")
      off += r
    }
    a
  }

  private def writeFrame(out: OutputStream, opcode: Int, payload: Array[Byte]): Unit =
    out.synchronized {
      out.write(0x80 | opcode)
      if (payload.length < 126) out.write(payload.length)
      else if (payload.length < 65536) {
        out.write(126); out.write(payload.length >> 8); out.write(payload.length & 0xff)
      } else throw new IllegalArgumentException("frame too large for test server")
      out.write(payload)
      out.flush()
    }
}
