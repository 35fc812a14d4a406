package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{Normalizer, WindowStats}

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("okx source (synthetic provider) → normalizer → memory sink, end to end") {
    val raw = spark.readStream.format("okx")
      .option("provider", "synthetic")
      .option("symbols", "BTC-USDT,ETH-USDT")
      .option("frames", "300")
      .option("frameIntervalMs", "0")
      .load()
    val q = Normalizer.normalize(raw)
      .writeStream.format("memory").queryName("norm_out")
      .outputMode("append").start()
    try {
      // provider emits 300 frames then stops; drain until counts settle
      var last = -1L
      var cur = 0L
      do {
        Thread.sleep(300)
        q.processAllAvailable()
        last = cur
        cur = spark.table("norm_out").count()
      } while (cur != last || cur == 0)
      val out = spark.table("norm_out")
      // 300 frames: 2 of 3 are books5, 1 of 3 trades (1 trade item each)
      assert(out.count() == 300)
      assert(out.where(col("event_type") === "book_topn").count() == 200)
      assert(out.where(col("event_type") === "trade").count() == 100)
      assert(out.select("symbol").distinct().count() == 2)
      // book payload parsed: 2 bid levels, 1 ask level
      val b = out.where(col("event_type") === "book_topn")
        .select(size(col("book.bids")).as("nb"), size(col("book.asks")).as("na"))
        .distinct().collect()
      assert(b.map(r => (r.getInt(0), r.getInt(1))).toSet == Set((2, 1)))
    } finally q.stop()
  }

  test("staleness fMGWS carries state across micro-batches and matches batch lag") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String, Long, Long)]
    val events = mem.toDF()
      .toDF("symbol", "channel", "ts_exchange_ms", "ts_recv_mono_ns")
    val gaps = StalenessStream.gaps(events)
    val q = gaps.writeStream.format("memory").queryName("gaps_out")
      .outputMode("append").start()
    try {
      // batch 1: two keys, interleaved arrival
      mem.addData(("A", "books5", 1000L, 1L), ("B", "books5", 500L, 2L),
        ("A", "books5", 1300L, 3L))
      q.processAllAvailable()
      // batch 2: continues from batch-1 state (the cross-batch lag)
      mem.addData(("A", "books5", 2000L, 4L), ("B", "books5", 900L, 5L))
      q.processAllAvailable()
      val got = spark.table("gaps_out")
        .select("symbol", "stale_ms").as[(String, Long)].collect().toSet
      assert(got == Set(("A", 300L), ("A", 700L), ("B", 400L)))

      // batch equivalence: same events through the batch lag operator
      val batchDf = Seq(("A", "books5", 1000L, 1L), ("B", "books5", 500L, 2L),
        ("A", "books5", 1300L, 3L), ("A", "books5", 2000L, 4L), ("B", "books5", 900L, 5L))
        .toDF("symbol", "channel", "ts_exchange_ms", "ts_recv_mono_ns")
      val batchGaps = WindowStats.stalenessGaps(batchDf)
        .select("symbol", "stale_ms").as[(String, Long)].collect().toSet
      assert(batchGaps == got)
    } finally q.stop()
  }

  test("sliding-window percentile report over replayed ingest clock") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val events = mem.toDF().toDF("ts_recv_epoch_ms", "lat_ms")
    val report = MetricsStream.latencyPercentiles(events, "lat_ms",
      timestamp_millis(col("ts_recv_epoch_ms")), minSamples = 20)
    val q = report.writeStream.format("memory").queryName("pct_out")
      .outputMode("update").start()
    try {
      val base = 1700000003000L
      // 25 events inside one second → all in the same 5s/1s windows
      mem.addData((0 until 25).map(i => (base + i * 10, (i + 1).toLong * 100)): _*)
      q.processAllAvailable()
      val rows = spark.table("pct_out")
        .select("p50", "p95", "p99", "cnt").distinct().collect()
      assert(rows.nonEmpty)
      // floor-index on sorted 100..2500 step 100: p50 idx=int(.5*24)=12 → 1300
      assert(rows.forall(r => r.getDouble(0) == 1300.0))
      assert(rows.forall(r => r.getDouble(1) == 2300.0)) // int(.95*24)=22
      assert(rows.forall(r => r.getDouble(2) == 2400.0)) // int(.99*24)=23
    } finally q.stop()
  }

  test("JSONL serializer is byte-compatible with the reference format") {
    val books =
      """{"arg":{"channel":"books5","instId":"BTC-USDT"},
        |"data":[{"ts":"1738195200123","bids":[["92578.70","0.51","0","3"]],
        |"asks":[["92578.80","0.10","0","1"]]}]}""".stripMargin.replace("\n", "")
    val trades =
      """{"arg":{"channel":"trades","instId":"ETH-USDT"},
        |"data":[{"ts":"1738195200456","px":"3205.85","sz":"0.034120","side":"buy","tradeId":"987654321"}]}"""
        .stripMargin.replace("\n", "")
    val raw = Seq(
      (books, 1738195200441L, 81234567890123L, 81234567901000L, 81234567915700L),
      (trades, 1738195200774L, 81234600000000L, 81234600009000L, 81234600021000L))
      .toDF("raw", "ts_recv_epoch_ms", "ts_recv_mono_ns", "ts_decoded_mono_ns", "ts_proc_mono_ns")
    val lines = Normalizer.normalize(raw)
      .select(col("event_type"), Sinks.jsonLine)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // FIXTURES.md §2 golden lines (levels re-encoded as [price,size,count])
    assert(lines("book_topn") ==
      """{"exchange":"okx","symbol":"BTC-USDT","channel":"books5","event_type":"book_topn","ts_exchange_ms":1738195200123,"ts_recv_epoch_ms":1738195200441,"ts_recv_mono_ns":81234567890123,"ts_decoded_mono_ns":81234567901000,"ts_proc_mono_ns":81234567915700,"payload":{"n":5,"best_bid":92578.7,"best_ask":92578.8,"bids":[[92578.7,0.51,3]],"asks":[[92578.8,0.1,1]]}}""")
    assert(lines("trade") ==
      """{"exchange":"okx","symbol":"ETH-USDT","channel":"trades","event_type":"trade","ts_exchange_ms":1738195200456,"ts_recv_epoch_ms":1738195200774,"ts_recv_mono_ns":81234600000000,"ts_decoded_mono_ns":81234600009000,"ts_proc_mono_ns":81234600021000,"payload":{"price":3205.85,"size":0.03412,"side":"buy","trade_id":"987654321"}}""")
  }

  test("console line formats match the reference stdout shapes") {
    val books =
      """{"arg":{"channel":"books5","instId":"BTC-USDT"},
        |"data":[{"ts":"1738195200123","bids":[["92578.70","0.51","0","3"]],
        |"asks":[["92578.80","0.10","0","1"]]}]}""".stripMargin.replace("\n", "")
    val raw = Seq((books, 1738195200440L, 81234567890123L, 81234567898677L, 81234567913424L))
      .toDF("raw", "ts_recv_epoch_ms", "ts_recv_mono_ns", "ts_decoded_mono_ns", "ts_proc_mono_ns")
    val line = graft.operators.Derived
      .withLatencies(Normalizer.normalize(raw))
      .select(graft.operators.Derived.consoleLine.as("l"))
      .as[String].collect().head
    assert(line ==
      "BTC-USDT | bid=92578.70 ask=92578.80 spread=0.10 | Ex→Recv=317ms Recv→Decode=8.554us Decode→Proc=14.747us")
  }

  test("csv snapshot writes a single atomically-replaced file") {
    val df = Seq(("A", "books5", 3L, 100.0), ("B", "trades", 2L, 50.0))
      .toDF("symbol", "channel", "stale_count", "stale_mean_ms")
    val out = java.nio.file.Files.createTempDirectory("csvsnap").toString + "/metrics_summary.csv"
    Sinks.writeSnapshotCsv(df.orderBy("symbol"), out)
    val lines = scala.io.Source.fromFile(out).getLines().toSeq
    assert(lines.head == "symbol,channel,stale_count,stale_mean_ms")
    assert(lines.size == 3)
    Sinks.writeSnapshotCsv(df.limit(1), out) // overwrite semantics
    assert(scala.io.Source.fromFile(out).getLines().size == 2)
  }
}
