package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Batch/streaming equivalence for the OHLC bar operator: the SAME
  * logical definition, fed the same trades, must produce identical bars
  * whether it runs as one batch aggregate or as watermarked append-mode
  * micro-batches (including mid-bar trades arriving across batches).
  */
class BarsStreamSpec extends SparkSpec {
  import spark.implicits._

  private val base = 1700000000000L // ms, aligned inside some day

  // (symbol, ts_ms, price, size, seq)
  private val trades: Seq[(String, Long, Double, Double, Long)] = Seq(
    ("BTC", base,          100.0, 1.0,  1L),
    ("BTC", base + 1000,   105.5, 2.0,  2L),
    ("BTC", base + 2000,    99.0, 0.5,  3L),
    ("BTC", base + 2000,   101.0, 0.25, 4L), // same-ms tie: seq breaks it
    ("ETH", base + 500,     10.0, 3.0,  5L),
    ("ETH", base + 60_000,  12.0, 1.0,  6L),
    // next minute bar
    ("BTC", base + 61_000,  98.0, 1.5,  7L),
    ("BTC", base + 62_000, 103.0, 2.5,  8L))

  private def withTime(df: org.apache.spark.sql.DataFrame) =
    df.toDF("symbol", "ts_exchange_ms", "price", "sz", "seq")
      .withColumn("event_time", timestamp_millis(col("ts_exchange_ms")))

  test("streaming append-mode bars equal the batch bars on the same trades") {
    implicit val sqlCtx = spark.sqlContext

    val batch = Bars.ohlc(withTime(trades.toDF()), col("seq"), "1 minute")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.toSeq.drop(2)).toMap

    val mem = MemoryStream[(String, Long, Double, Double, Long)]
    val stream = Bars.ohlc(
      withTime(mem.toDF()).withWatermark("event_time", "10 seconds"),
      col("seq"), "1 minute")
    val q = stream.writeStream.format("memory").queryName("bars_stream")
      .outputMode("append").start()
    try {
      // split mid-bar across micro-batches: state must carry partial bars
      mem.addData(trades.take(3))
      q.processAllAvailable()
      mem.addData(trades.drop(3))
      q.processAllAvailable()
      // sentinel far past the last bar pushes the watermark so every real
      // bar finalizes (its own bar stays open and unemitted)
      mem.addData(("ZZZ", base + 10 * 60_000, 1.0, 1.0, 99L))
      q.processAllAvailable()

      val streamed = spark.table("bars_stream")
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.toSeq.drop(2)).toMap
      assert(streamed == batch,
        s"streaming bars diverge from batch:\n  stream=$streamed\n  batch=$batch")
      // and the values themselves are the hand-computable candles
      val btc0 = batch(("BTC", (base / 60_000) * 60_000))
      assert(btc0 == Seq(100.0, 105.5, 99.0, 101.0, 3.75, 4L), btc0)
    } finally q.stop()
  }
}
