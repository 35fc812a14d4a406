package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.ExactPercentile

/** The production state-store answer for 100 TB streams: every streaming
  * operator in this engine must run unchanged under the spill-to-disk
  * RocksDB state store (`spark.sql.streaming.stateStore.providerClass` →
  * RocksDBStateStoreProvider — the provider that bounds executor memory
  * when keyed state outgrows the default in-memory HDFS-backed map).
  * The provider is a pure config swap, so these tests re-run two
  * representative stateful pipelines under RocksDB and assert
  * bit-identical results vs the same logic in batch:
  *
  *  - watermarked append-mode OHLC bars (struct-buffer min_by/max_by
  *    aggregation state, mid-bar rows split across micro-batches);
  *  - sliding-window ExactPercentile (a TypedImperativeAggregate whose
  *    buffer must round-trip RocksDB's byte-serialized state, merging
  *    across batch boundaries — the q121 gate's path).
  *
  * The conf is set per-query-start and restored afterwards; the batch
  * halves of the assertions never touch the state store.
  */
class RocksDBStateStoreSpec extends SparkSpec {
  import spark.implicits._

  private val RocksDB =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  private def withRocksDB[A](body: => A): A = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDB)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None    => spark.conf.unset(ProviderKey)
    }
  }

  private val base = 1700000000000L

  test("append-mode bars under RocksDB state store equal batch bars") {
    implicit val sqlCtx = spark.sqlContext
    val trades: Seq[(String, Long, Double, Double, Long)] = Seq(
      ("BTC", base, 100.0, 1.0, 1L),
      ("BTC", base + 1000, 105.5, 2.0, 2L),
      ("BTC", base + 2000, 99.0, 0.5, 3L),
      ("ETH", base + 500, 10.0, 3.0, 4L),
      ("BTC", base + 61_000, 98.0, 1.5, 5L),
      ("ETH", base + 62_000, 12.0, 1.0, 6L))
    def withTime(df: org.apache.spark.sql.DataFrame) =
      df.toDF("symbol", "ts_exchange_ms", "price", "sz", "seq")
        .withColumn("event_time", timestamp_millis(col("ts_exchange_ms")))

    val batch = Bars.ohlc(withTime(trades.toDF()), col("seq"), "1 minute")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.toSeq.drop(2)).toMap

    val streamed = withRocksDB {
      val mem = MemoryStream[(String, Long, Double, Double, Long)]
      val bars = Bars.ohlc(
        withTime(mem.toDF()).withWatermark("event_time", "10 seconds"),
        col("seq"), "1 minute")
      val q = bars.writeStream.format("memory").queryName("rocksdb_bars")
        .outputMode("append").start()
      try {
        mem.addData(trades.take(3))
        q.processAllAvailable()
        mem.addData(trades.drop(3))
        q.processAllAvailable()
        mem.addData(("ZZZ", base + 10 * 60_000, 1.0, 1.0, 99L))
        q.processAllAvailable()
      } finally q.stop()
      spark.table("rocksdb_bars").filter(col("symbol") =!= "ZZZ")
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.toSeq.drop(2)).toMap
    }
    assert(streamed == batch,
      s"RocksDB bars diverge from batch:\n  stream=$streamed\n  batch=$batch")
  }

  test("sliding-window ExactPercentile buffers round-trip RocksDB state") {
    implicit val sqlCtx = spark.sqlContext
    // 3 seconds of data, ~25 values per second: every 5s/1s sliding
    // window that closes holds >= 20 samples; values chosen so each
    // window has a distinct exact percentile set.
    val events: Seq[(Long, Double)] =
      (0 until 75).map(i => (base + (i * 40).toLong, (i * 7 % 75).toDouble))
    val maxTs = events.map(_._1).max

    def report(df: org.apache.spark.sql.DataFrame) =
      MetricsStream.latencyPercentiles(df, "value", col("event_time"))

    val batch = report(
      events.toDF("tms", "value")
        .withColumn("event_time", timestamp_millis(col("tms"))))
      .collect().map(r => r.getTimestamp(0) -> r.toSeq.drop(2)).toMap

    val streamed = withRocksDB {
      val mem = MemoryStream[(Long, Double)]
      val rep = report(
        mem.toDF().toDF("tms", "value")
          .withColumn("event_time", timestamp_millis(col("tms")))
          .withWatermark("event_time", "0 seconds"))
      val q = rep.writeStream.format("memory").queryName("rocksdb_pcts")
        .outputMode("append").start()
      try {
        // batch split mid-window: percentile buffers must merge in-store
        events.grouped(25).foreach { chunk =>
          mem.addData(chunk)
          q.processAllAvailable()
        }
        mem.addData((maxTs + 10_000L, 0.0)) // close every real window
        q.processAllAvailable()
      } finally q.stop()
      spark.table("rocksdb_pcts")
        .collect().map(r => r.getTimestamp(0) -> r.toSeq.drop(2)).toMap
    }
    // streaming emits only closed windows; every emitted window must
    // match its batch twin exactly, and the >=20-sample ones must exist
    assert(streamed.nonEmpty, "no windows emitted under RocksDB")
    streamed.foreach { case (w, got) =>
      assert(batch.get(w).contains(got),
        s"window $w diverges: stream=$got batch=${batch.get(w)}")
    }
  }

  test("q208 streaming upsert compaction runs unchanged under RocksDB") {
    // the gate's complete-mode max(struct) aggregate carries a struct
    // buffer through the store — this re-runs the REGISTRY query itself
    // with the provider swapped, asserting the compacted snapshot is
    // bit-identical to the batch latest-wins.
    val sf = "/root/testdata/sf0.001"
    val got = withRocksDB {
      graft.SparkEntry.queries("q208_streaming_upsert")(spark, sf)
        .select("o_orderkey", "ver", "price")
        .as[(Long, Long, Double)].collect().toSeq.sorted
    }
    val o = graft.Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_totalprice")
      .filter($"o_orderkey" % 4 === 0)
      .as[(Long, Double)].collect()
    val expect = o.collect {
      case (k, p) if k % 11 != 0 && k % 3 == 0 => (k, 1L, p + 10.0)
      case (k, p) if k % 11 != 0               => (k, 0L, p)
    }.toSeq.sorted
    assert(got == expect, "RocksDB-backed compaction diverges from batch")
  }
}
