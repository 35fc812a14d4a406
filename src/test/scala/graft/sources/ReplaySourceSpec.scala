package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Normalizer
import graft.streaming.Sinks

class ReplaySourceSpec extends SparkSpec {
  import spark.implicits._

  test("JSONL round trip: normalize → serialize → replay → identical events") {
    val frames = Seq(
      ("""{"arg":{"channel":"books5","instId":"BTC-USDT"},"data":[{"ts":"1738195200123","bids":[["92578.70","0.51","0","3"],["92578.60","1.2","0","5"]],"asks":[["92578.80","0.10","0","1"]]}]}""",
        1738195200441L, 81234567890123L, 81234567901000L, 81234567915700L),
      ("""{"arg":{"channel":"trades","instId":"ETH-USDT"},"data":[{"ts":"1738195200456","px":"3205.85","sz":"0.034120","side":"buy","tradeId":"987654321"},{"ts":"1738195200457","px":"3205.86","sz":"1.0","side":"sell"}]}""",
        1738195200774L, 81234600000000L, 81234600009000L, 81234600021000L))
      .toDF("raw", "ts_recv_epoch_ms", "ts_recv_mono_ns", "ts_decoded_mono_ns", "ts_proc_mono_ns")
    val events = Normalizer.normalize(frames)

    val dir = java.nio.file.Files.createTempDirectory("replay").toString
    events.select(Sinks.jsonLine).write.mode("overwrite").text(dir)

    val replayed = ReplaySource.read(spark, dir)
    // same structure; JSON reads are nullable-everywhere by construction
    assert(replayed.schema.simpleString == events.schema.simpleString)
    val a = events.orderBy("ts_exchange_ms").collect().map(_.toString).toSeq
    val b = replayed.orderBy("ts_exchange_ms").collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("streaming replay delivers the same rows via the file source") {
    val frames = Seq(
      ("""{"arg":{"channel":"trades","instId":"X"},"data":[{"ts":"10","px":"1.5","sz":"2.5","side":"buy","tradeId":"a"}]}""",
        100L, 1L, 2L, 3L))
      .toDF("raw", "ts_recv_epoch_ms", "ts_recv_mono_ns", "ts_decoded_mono_ns", "ts_proc_mono_ns")
    val dir = java.nio.file.Files.createTempDirectory("replay-stream").toString
    Normalizer.normalize(frames).select(Sinks.jsonLine).write.mode("overwrite").text(dir)

    val q = ReplaySource.readStream(spark, dir)
      .writeStream.format("memory").queryName("replay_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      val out = spark.table("replay_out")
      assert(out.count() == 1)
      assert(out.select("trade.trade_id").as[String].collect().head == "a")
    } finally q.stop()
  }
}
