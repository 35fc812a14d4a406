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

  test("stream-stream interval join: each trade joins book quotes within its window") {
    implicit val sqlCtx = spark.sqlContext
    val books = MemoryStream[(String, Long, Double)]
    val trades = MemoryStream[(String, Long, Double)]
    val b = books.toDF().toDF("symbol", "ts_ms", "bid")
      .withColumn("b_time", timestamp_millis(col("ts_ms")))
      .withWatermark("b_time", "10 seconds")
    val t = trades.toDF().toDF("symbol", "ts_ms", "price")
      .withColumn("t_time", timestamp_millis(col("ts_ms")))
      .withWatermark("t_time", "10 seconds")
    // quote valid for a trade if it arrived within the 5 s before it
    val joined = t.alias("t").join(b.alias("b"),
      expr("""t.symbol = b.symbol AND
              b.b_time BETWEEN t.t_time - INTERVAL 5 SECONDS AND t.t_time"""))
      .select(col("t.symbol"), col("t.ts_ms").as("trade_ms"),
        col("b.ts_ms").as("quote_ms"), col("price"), col("bid"))
    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    try {
      val base = 1700000000000L
      books.addData(("BTC", base, 100.0), ("BTC", base + 2000, 101.0))
      trades.addData(("BTC", base + 3000, 100.5))
      q.processAllAvailable()
      val got = spark.table("ssj_out")
        .select("quote_ms", "bid").as[(Long, Double)].collect().toSet
      // both quotes fall inside [trade-5s, trade]
      assert(got == Set((base, 100.0), (base + 2000, 101.0)))
    } finally q.stop()
  }

  test("hash-stratified sampling makes identical decisions in streaming and batch") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Sampling
    val rows = (0L until 200L).map(i => (i, if (i % 3 == 0) "en" else "de"))
    val mem = MemoryStream[(Long, String)]
    val streamed = Sampling.stratified(mem.toDF().toDF("doc_id", "lang"),
      col("doc_id"), col("lang"), Seq("en" -> 0.3, "de" -> 0.6), 1.0, "s1")
    val q = streamed.writeStream.format("memory").queryName("samp_out")
      .outputMode("append").start()
    try {
      // deliver across 3 micro-batches — per-row decisions can't depend on
      // batching because the operator is stateless and hash-deterministic
      rows.grouped(70).foreach { g => mem.addData(g); q.processAllAvailable() }
      val streamKept = spark.table("samp_out")
        .select("doc_id").as[Long].collect().toSet
      val batchKept = Sampling.stratified(rows.toDF("doc_id", "lang"),
          col("doc_id"), col("lang"), Seq("en" -> 0.3, "de" -> 0.6), 1.0, "s1")
        .select("doc_id").as[Long].collect().toSet
      assert(streamKept == batchKept && streamKept.nonEmpty &&
        streamKept.size < rows.size)
    } finally q.stop()
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
