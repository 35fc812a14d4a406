package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.WindowStats

class MetricsLineSpec extends SparkSpec {
  import spark.implicits._

  test("metrics line matches the reference format with gating and zero-rates") {
    // 21 events (≥ 20-sample gate), symbol split 11/10, latencies 1..21 ms;
    // decode lat: two zeros among 21 → zero=9.5%; proc lat all 1000 ns.
    val events = (1 to 21).map { i =>
      (if (i % 2 == 0) "BTC-USDT" else "ETH-USDT",
        i.toLong,                                 // lat_ex_to_recv_ms
        if (i <= 2) 0L else i * 1000L,            // lat_recv_to_decode_ns
        1000L)                                    // lat_decode_to_proc_ns
    }.toDF("symbol", "lat_ex_to_recv_ms", "lat_recv_to_decode_ns", "lat_decode_to_proc_ns")
    val line = MetricsStream.metricsLine(events).as[String].collect().head
    // floor-index percentiles over sorted 1..21: p50 idx=10 → 11; p95 idx=19 → 20; p99 idx=19 → 20
    assert(line ==
      "Metrics | Ex→Recv p50=11.0ms p95=20.0ms p99=20.0ms" +
      " | Recv→Decode p50=11.000us p95=20.000us p99=20.000us (zero=9.5%)" +
      " | Decode→Proc p50=1.000us p95=1.000us p99=1.000us (zero=0.0%)" +
      " | Msgs: BTC-USDT:10, ETH-USDT:11")
  }

  test("series below the min-sample gate are omitted from the line") {
    val events = (1 to 5).map(i => ("X", i.toLong, i.toLong, i.toLong))
      .toDF("symbol", "lat_ex_to_recv_ms", "lat_recv_to_decode_ns", "lat_decode_to_proc_ns")
    val line = MetricsStream.metricsLine(events).as[String].collect().head
    assert(line == "Metrics | Msgs: X:5")
  }

  test("formatted 13-column CSV snapshot shape (D7/D8)") {
    val lat = Seq(("A", "books5", 10L), ("A", "books5", 20L), ("B", "trades", 5L))
      .toDF("symbol", "channel", "lat_ms")
    val stale = Seq(("A", "books5", 100L), ("A", "books5", 300L))
      .toDF("symbol", "channel", "stale_ms")
    val snap = WindowStats.csvSnapshot(lat, stale, Seq("symbol", "channel"), "lat_ms")
    val out = WindowStats.csvSnapshotFormatted(snap)
    assert(out.columns.toSeq == Seq("generated_at_utc", "symbol", "channel",
      "lat_count", "lat_mean_ms", "lat_std_ms", "lat_min_ms", "lat_max_ms",
      "stale_count", "stale_mean_ms", "stale_std_ms", "stale_min_ms", "stale_max_ms"))
    val rows = out.collect()
    val a = rows.find(_.getString(1) == "A").get
    assert(a.getString(4) == "15.000")   // lat mean %.3f
    assert(a.getString(9) == "200.000")  // stale mean
    val b = rows.find(_.getString(1) == "B").get
    assert(b.getLong(8) == 0L && b.getString(9) == "0.000") // A9 defaults
  }
}
