package graft.tools

import org.apache.spark.sql.streaming.Trigger

import graft.GraftSession
import graft.operators.Normalizer

/** Dev-only scratch probe (not part of the library surface).
  * Currently: live-path throughput — synthetic WebSocket feed → DSv2
  * source → normalizer → noop-ish sink, events/second.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("probe", "8")
    val frames = 300000L
    val raw = spark.readStream.format("okx")
      .option("provider", "synthetic")
      .option("symbols", "BTC-USDT,ETH-USDT,SOL-USDT,XRP-USDT")
      .option("frames", frames.toString)
      .option("frameIntervalMs", "1")
      .option("burst", "500")
      .option("maxBuffer", "2000000")
      .load()
    val t0 = System.nanoTime()
    val q = Normalizer.normalize(raw)
      .writeStream.format("memory").queryName("tp")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("200 milliseconds"))
      .start()
    var n = 0L
    var lastN = -1L
    while (n < frames && n != lastN) {
      Thread.sleep(2000)
      q.processAllAvailable()
      lastN = n
      n = spark.table("tp").count()
      println(s"[tp] $n events, ${n / ((System.nanoTime() - t0) / 1e9)} ev/s")
    }
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[tp] FINAL: $n events in $secs%.1f s = ${n / secs}%.0f events/s end-to-end")
    q.stop()
    spark.stop()
  }
}
