package graft.sources

import java.util.concurrent.{LinkedBlockingQueue, TimeUnit}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.SparkSpec
import graft.operators.Normalizer

/** S1-S4 against a REAL socket, hermetically: [[LoopbackWsServer]] speaks
  * RFC 6455 on 127.0.0.1, so the production [[WebSocketFrameProvider]]
  * path — JDK WebSocket handshake, subscribe send, text-frame receive,
  * ping cadence, close-triggered reconnect with backoff — executes
  * end-to-end inside the zero-egress sandbox. This closes the gap
  * `OkxLiveSocketSpec` leaves when GRAFT_WS_LIVE is unset: the live spec
  * anchors against the real OKX endpoint when reachable; THIS spec
  * anchors the socket machinery always.
  */
class OkxLoopbackSocketSpec extends SparkSpec {

  private val ack =
    """{"event":"subscribe","arg":{"channel":"books5","instId":"BTC-USDT"}}"""

  private def books5Frame(seq: Int, conn: Int): String = {
    val ts = 1700000000000L + conn * 1000000L + seq * 1000L
    s"""{"arg":{"channel":"books5","instId":"BTC-USDT"},"data":[{"ts":"$ts",""" +
      s""""bids":[["100.${seq}","1.5","0","3"],["99.5","2.0","0","5"]],""" +
      s""""asks":[["101.${seq}","1.0","0","2"]]}]}"""
  }

  private def collect(provider: WebSocketFrameProvider, maxFrames: Int,
      maxWaitSecs: Long): Seq[String] = {
    val q = new LinkedBlockingQueue[String]()
    provider.start(q.offer(_))
    val out = Seq.newBuilder[String]
    var n = 0
    val deadline = System.nanoTime() + maxWaitSecs * 1000000000L
    while (n < maxFrames && System.nanoTime() < deadline) {
      val f = q.poll(200, TimeUnit.MILLISECONDS)
      if (f != null) { out += f; n += 1 }
    }
    out.result()
  }

  private def provider(url: String, extra: Map[String, String] = Map.empty) =
    new WebSocketFrameProvider(new CaseInsensitiveStringMap(
      (Map("url" -> url, "symbols" -> "BTC-USDT,ETH-USDT",
        "channels" -> "books5,trades") ++ extra).asJava))

  test("S1+S2: handshake, channel-major subscribe payload, data frames arrive") {
    val server = new LoopbackWsServer(
      (_, conn) => ack +: (0 until 3).map(books5Frame(_, conn)))
    val p = provider(server.url)
    try {
      val frames = collect(p, maxFrames = 4, maxWaitSecs = 10)
      assert(frames.size == 4, s"expected ack + 3 data frames, got $frames")
      assert(frames.head.contains("\"event\":\"subscribe\""))
      assert(frames.tail.forall(_.contains("\"data\"")))
      // the payload that crossed the wire IS the S2 cross-product,
      // channel-major (reference iterates channels outermost)
      val sent = server.subscribesSeen.asScala.toSeq
      assert(sent == Seq(WebSocketFrameProvider.subscribePayload(
        Seq("BTC-USDT", "ETH-USDT"), Seq("books5", "trades"))), sent.toString)
    } finally { p.close(); server.close() }
  }

  test("frames off the wire normalize to valid book events end-to-end") {
    import spark.implicits._
    val server = new LoopbackWsServer(
      (_, conn) => ack +: (0 until 3).map(books5Frame(_, conn)))
    val p = provider(server.url)
    try {
      val frames = collect(p, maxFrames = 4, maxWaitSecs = 10)
        .filter(_.contains("\"data\""))
      assert(frames.size == 3)
      val now = System.currentTimeMillis()
      val df = frames.zipWithIndex
        .map { case (raw, i) => (raw, now, i * 1000000L, i * 1000000L + 100, i * 1000000L + 200) }
        .toDF("raw", "ts_recv_epoch_ms", "ts_recv_mono_ns", "ts_decoded_mono_ns", "ts_proc_mono_ns")
      val events = Normalizer.normalize(df).collect()
      assert(events.length == 3, s"normalizer kept ${events.length} of 3")
      events.foreach { e =>
        assert(e.getAs[String]("symbol") == "BTC-USDT")
        assert(e.getAs[String]("channel") == "books5")
        assert(e.getAs[Long]("ts_exchange_ms") >= 1700000000000L)
        assert(e.getAs[org.apache.spark.sql.Row]("book")
          .getAs[Double]("best_bid") > 99.0)
      }
    } finally { p.close(); server.close() }
  }

  test("S3: the provider pings on its liveness cadence") {
    val server = new LoopbackWsServer((_, _) => Seq(ack))
    val p = provider(server.url, Map("pingSeconds" -> "1"))
    try {
      collect(p, maxFrames = 1, maxWaitSecs = 5)
      assert(server.firstPing.await(5, TimeUnit.SECONDS),
        "no ping within 5 s at pingSeconds=1")
      assert(server.pingsSeen.get() >= 1)
    } finally { p.close(); server.close() }
  }

  test("S4: a server-side close triggers reconnect and a fresh subscribe") {
    // each connection serves ONE data frame tagged with its connection
    // index, then closes — the provider's reconnect loop must come back
    // and re-subscribe (backoff ≈ 0.4-1.2 s for attempts 1-2)
    val server = new LoopbackWsServer(
      (_, conn) => Seq(s"""{"arg":{"channel":"books5","instId":"BTC-USDT"},"conn":$conn}"""),
      closeAfterServe = true)
    val p = provider(server.url)
    try {
      val frames = collect(p, maxFrames = 3, maxWaitSecs = 20)
      assert(frames.size >= 2, s"no reconnect: only $frames")
      val conns = frames.flatMap(f => "\"conn\":(\\d+)".r.findFirstMatchIn(f).map(_.group(1).toInt))
      assert(conns.distinct.size >= 2,
        s"frames did not span reconnected sessions: $conns")
      assert(server.subscribesSeen.asScala.size >= 2,
        "reconnected session did not re-subscribe")
    } finally { p.close(); server.close() }
  }
}
