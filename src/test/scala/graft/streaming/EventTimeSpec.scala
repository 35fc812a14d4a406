package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Dedup

/** T2 (idiomatic event-time variant, absent in the reference) + streaming
  * dedup with watermark-bounded state.
  */
class EventTimeSpec extends SparkSpec {
  import spark.implicits._

  test("event-time window agg with watermark emits finalized windows (append mode)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val events = mem.toDF().toDF("ts_exchange_ms", "value")
      .withColumn("event_time", timestamp_millis(col("ts_exchange_ms")))
    val agg = events
      .withWatermark("event_time", "10 seconds")
      .groupBy(window(col("event_time"), "5 seconds"))
      .agg(count(lit(1)).as("cnt"), max(col("value")).as("max_v"))
      .select(unix_millis(col("window.start")).as("ws"), col("cnt"), col("max_v"))
    val q = agg.writeStream.format("memory").queryName("evt_win")
      .outputMode("append").start()
    try {
      val base = 1700000000000L
      mem.addData((base, 1.0), (base + 1000, 2.0), (base + 6000, 3.0))
      q.processAllAvailable()
      // advance watermark past the first window: event at +30s
      mem.addData((base + 30000, 9.0))
      q.processAllAvailable()
      mem.addData((base + 60000, 1.0)) // push watermark again to flush +30s window
      q.processAllAvailable()
      val rows = spark.table("evt_win").select("ws", "cnt", "max_v")
        .as[(Long, Long, Double)].collect().toMap2
      assert(rows((base / 5000) * 5000) == (2L, 2.0))       // finalized first window
      assert(rows(((base + 6000) / 5000) * 5000) == (1L, 3.0))
    } finally q.stop()
  }

  private implicit class M(rows: Array[(Long, Long, Double)]) {
    def toMap2: Map[Long, (Long, Double)] = rows.map(r => r._1 -> (r._2, r._3)).toMap
  }

  test("streaming exact dedup drops repeated content across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val events = mem.toDF().toDF("event_time", "text")
    val deduped = Dedup.streamingExact(events, "text", "event_time", "1 minute")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      val t = (s: Long) => new Timestamp(1700000000000L + s * 1000)
      mem.addData((t(0), "alpha"), (t(1), "beta"), (t(2), "alpha"))
      q.processAllAvailable()
      mem.addData((t(3), "alpha"), (t(4), "gamma")) // alpha still in state
      q.processAllAvailable()
      val kept = spark.table("dedup_out").select("text").as[String].collect().sorted
      assert(kept.toSeq == Seq("alpha", "beta", "gamma"))
    } finally q.stop()
  }
}
