package graft.sources

import org.apache.spark.sql.connector.read.streaming.ReadLimit
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.scalatest.funsuite.AnyFunSuite

/** Checkpoint-recovery offset semantics of the OKX DSv2 source: offsets
  * must never regress when a restarted (empty-buffer) incarnation recovers
  * a large committed offset, and frames buffered since restart are
  * re-anchored at the recovered offset instead of being over-dropped.
  */
class OkxRestartSpec extends AnyFunSuite {

  private def newStream(frames: Int): OkxMicroBatchStream = {
    val m = new java.util.HashMap[String, String]()
    m.put("provider", "synthetic")
    m.put("frames", frames.toString)
    m.put("frameIntervalMs", "0")
    new OkxMicroBatchStream(new CaseInsensitiveStringMap(m))
  }

  private def awaitFrames(s: OkxMicroBatchStream, n: Long): Unit = {
    val deadline = System.nanoTime() + 10_000_000_000L
    while (s.reportLatestOffset().asInstanceOf[FrameOffset].n < n) {
      if (System.nanoTime() > deadline) fail(s"timed out waiting for $n frames")
      Thread.sleep(10)
    }
  }

  test("S2 subscription payload is the channel-major symbols x channels cross-product") {
    val p = WebSocketFrameProvider.subscribePayload(
      Seq("BTC-USDT", "ETH-USDT"), Seq("books5", "trades"))
    assert(p ==
      """{"op":"subscribe","args":[{"channel":"books5","instId":"BTC-USDT"},""" +
      """{"channel":"books5","instId":"ETH-USDT"},{"channel":"trades","instId":"BTC-USDT"},""" +
      """{"channel":"trades","instId":"ETH-USDT"}]}""")
  }

  test("S4 backoff: capped exponential with +/-20% jitter (okx_ws.py:100-101)") {
    assert(WebSocketFrameProvider.backoffMillis(1, 0.5) == 500L)   // 0.5s * 1.0
    assert(WebSocketFrameProvider.backoffMillis(2, 0.0) == 800L)   // 1.0s * 0.8
    assert(WebSocketFrameProvider.backoffMillis(3, 1.0) == 2400L)  // 2.0s * 1.2
    // cap at 30s regardless of attempt; jitter still applies
    assert(WebSocketFrameProvider.backoffMillis(20, 0.0) == 24000L)
    assert(WebSocketFrameProvider.backoffMillis(20, 1.0) == 36000L)
    // monotone non-decreasing below the cap at fixed jitter
    val seq = (1 to 10).map(WebSocketFrameProvider.backoffMillis(_, 0.5))
    assert(seq == seq.sorted)
  }

  test("latestOffset never returns an end behind a recovered start") {
    val s = newStream(40)
    try {
      awaitFrames(s, 40)
      val end = s.latestOffset(FrameOffset(1000L), ReadLimit.maxRows(25L))
        .asInstanceOf[FrameOffset].n
      assert(end >= 1000L, s"offset regressed: $end < 1000")
      assert(end == 1025L) // 40 post-restart frames rebased to [1000,1040)
    } finally s.stop()
  }

  test("post-restart frames are served at rebased offsets and commit drops exactly them") {
    val s = newStream(40)
    try {
      awaitFrames(s, 40)
      val end = s.latestOffset(FrameOffset(1000L), ReadLimit.maxRows(25L))
      val served = s.planInputPartitions(FrameOffset(1000L), end)
        .map(_.asInstanceOf[FramesPartition].frames.length).sum
      assert(served == 25)
      s.commit(end)
      // remaining 15 frames continue from 1025 with nothing lost
      val end2 = s.latestOffset(end, ReadLimit.maxRows(100L))
        .asInstanceOf[FrameOffset].n
      assert(end2 == 1040L)
      val served2 = s.planInputPartitions(end, FrameOffset(end2))
        .map(_.asInstanceOf[FramesPartition].frames.length).sum
      assert(served2 == 15)
    } finally s.stop()
  }

  test("no offset runaway under the engine's real ordering (latestOffset before commit)") {
    // MicroBatchExecution calls latestOffset(prevEnd) BEFORE
    // source.commit(prevEnd); a rebase keyed only on base+frames.size
    // re-served the same frames at fresh offsets forever (the r02 hang).
    val s = newStream(30)
    try {
      awaitFrames(s, 30)
      var start = 0L
      var i = 0
      while (i < 5) {
        val end = s.latestOffset(FrameOffset(start), ReadLimit.maxRows(1000L))
          .asInstanceOf[FrameOffset].n
        if (end > start) {
          val served = s.planInputPartitions(FrameOffset(start), FrameOffset(end))
            .map(_.asInstanceOf[FramesPartition].frames.length).sum
          assert(served == (end - start))
        }
        // commit of the PREVIOUS end happens only now, mimicking the engine
        s.commit(FrameOffset(start))
        assert(end <= 30L, s"offset runaway: batch $i handed out $end > 30")
        start = end
        i += 1
      }
      assert(start == 30L)
    } finally s.stop()
  }

  test("WAL-replayed batch before any latestOffset call does not over-drop new frames") {
    val s = newStream(40)
    try {
      awaitFrames(s, 40)
      // recovery replays an uncommitted batch [1000, 1025) straight away
      val served = s.planInputPartitions(FrameOffset(1000L), FrameOffset(1025L))
        .map(_.asInstanceOf[FramesPartition].frames.length).sum
      assert(served == 25)
      s.commit(FrameOffset(1025L))
      val end = s.latestOffset(FrameOffset(1025L), ReadLimit.maxRows(100L))
        .asInstanceOf[FrameOffset].n
      assert(end == 1040L) // the other 15 frames survived the replayed commit
    } finally s.stop()
  }
}
