package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Stream-stream attribution join semantics that the q131 oracle gate
  * (which replays with an effectively-infinite watermark) cannot see:
  * cross-batch state matching with a TIGHT watermark, and the horizon
  * bound excluding on-time clicks outside the attribution window.
  */
class StreamingJoinsSpec extends SparkSpec {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def startPair(horizon: String, delay: String, name: String) = {
    val memI = MemoryStream[(Long, Long, Long)]
    val memC = MemoryStream[(Long, Long, Long)]
    val iDf = memI.toDF().toDF("imp_id", "i_user", "i_ts")
      .withColumn("i_time", timestamp_millis(col("i_ts")))
      .withWatermark("i_time", delay)
    val cDf = memC.toDF().toDF("clk_id", "c_user", "c_ts")
      .withColumn("c_time", timestamp_millis(col("c_ts")))
      .withWatermark("c_time", delay)
    val q = Joins.attribution(iDf, cDf, horizon)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    (memI, memC, q)
  }

  test("impression and click in different micro-batches still match (join state)") {
    val (memI, memC, q) = startPair("1 hour", "1 minute", "sj_cross_batch")
    try {
      memI.addData((1L, 10L, 1000000L))          // batch 1: impression only
      q.processAllAvailable()
      memC.addData((2L, 10L, 1060000L))          // batch 2: click 60 s later
      q.processAllAvailable()
      val rows = spark.table("sj_cross_batch")
        .select("imp_id", "clk_id", "user_id").as[(Long, Long, Long)].collect()
      assert(rows.toSet == Set((1L, 2L, 10L)))
    } finally q.stop()
  }

  test("on-time click outside the attribution horizon does not match") {
    val (memI, memC, q) = startPair("1 hour", "1 minute", "sj_horizon")
    try {
      memI.addData((1L, 10L, 1000000L))
      // same user, 2 h later — inside no impression's horizon; and a
      // click BEFORE the impression must not match either
      memC.addData((2L, 10L, 1000000L + 7200000L), (3L, 10L, 400000L))
      q.processAllAvailable()
      assert(spark.table("sj_horizon").isEmpty)
    } finally q.stop()
  }

  test("matches only pair users with equal keys") {
    val (memI, memC, q) = startPair("1 hour", "1 minute", "sj_keys")
    try {
      memI.addData((1L, 10L, 1000000L), (2L, 11L, 1000000L))
      memC.addData((3L, 11L, 1005000L))
      q.processAllAvailable()
      val rows = spark.table("sj_keys")
        .select("imp_id", "clk_id", "user_id").as[(Long, Long, Long)].collect()
      assert(rows.toSet == Set((2L, 3L, 11L)))
    } finally q.stop()
  }
}
