package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit-level TWS sessionization semantics (q138 gates the full-corpus
  * oracle match; this pins the mechanics on a hand-checkable fixture):
  * gap split, timer-driven tail close, and the no-double-emit collision
  * between the event-close and timer-close paths.
  */
class SessionsTwsSpec extends SparkSpec {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val Gap = 1800000L
  private val Provider = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDB =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def run(name: String)(feed: (MemoryStream[(Long, Long, Double)],
      org.apache.spark.sql.streaming.StreamingQuery) => Unit) = {
    val prev = spark.conf.getOption(Provider)
    spark.conf.set(Provider, RocksDB)
    try {
      val mem = MemoryStream[(Long, Long, Double)]
      val src = mem.toDF().toDF("user_id", "ts_ms", "value")
        .withColumn("event_time", timestamp_millis(col("ts_ms")))
        .withWatermark("event_time", "0 seconds")
      val q = SessionsTws.sessions(src).toDF()
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try feed(mem, q) finally q.stop()
      spark.table(name).filter(col("user_id") >= 0)
        .select("user_id", "session_start_ms", "session_end_ms", "cnt", "total_value")
        .as[(Long, Long, Long, Long, Double)].collect().toSet
    } finally prev match {
      case Some(p) => spark.conf.set(Provider, p)
      case None    => spark.conf.unset(Provider)
    }
  }

  test("gap >= 30 min splits sessions; tail session closes via event-time timer") {
    val got = run("tws_sess_split") { (mem, q) =>
      // user 1: two events 10 min apart (one session), then one exactly
      // Gap later (boundary → NEW session, mirroring session_window)
      mem.addData((1L, 0L, 1.5), (1L, 600000L, 2.5))
      q.processAllAvailable()
      mem.addData((1L, 600000L + Gap, 4.0))
      q.processAllAvailable()
      // sentinel pushes close the tail via the registered timer
      mem.addData((-1L, 600000L + 3 * Gap, 0.0))
      q.processAllAvailable()
      mem.addData((-1L, 600000L + 4 * Gap, 0.0))
      q.processAllAvailable()
    }
    assert(got == Set(
      (1L, 0L, 600000L + Gap, 2L, 4.0),
      (1L, 600000L + Gap, 600000L + 2 * Gap, 1L, 4.0)))
  }

  test("event-close and timer-close collision emits each session exactly once") {
    val got = run("tws_sess_collide") { (mem, q) =>
      mem.addData((1L, 0L, 1.0))
      q.processAllAvailable()
      // this batch advances the watermark past session-1's horizon AND
      // carries the event that starts session 2 — whichever of the
      // timer/input paths runs first, session 1 must appear once
      mem.addData((1L, 2 * Gap, 2.0), (-1L, 2 * Gap, 0.0))
      q.processAllAvailable()
      mem.addData((-1L, 4 * Gap, 0.0))
      q.processAllAvailable()
      mem.addData((-1L, 5 * Gap, 0.0))
      q.processAllAvailable()
    }
    assert(got == Set(
      (1L, 0L, Gap, 1L, 1.0),
      (1L, 2 * Gap, 3 * Gap, 1L, 2.0)))
  }
}
