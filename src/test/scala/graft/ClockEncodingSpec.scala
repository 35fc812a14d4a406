package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType, TimestampNTZType}

/** Property: `Tables.events` yields IDENTICAL derived clocks regardless of
  * the fixture's physical `ts` encoding.
  *
  * The harness has shipped `ts` as TIMESTAMP(NANOS) (read as Long ns via
  * `nanosAsLong` — physically indistinguishable from a plain int64 column
  * to the reader) and as `timestamp[us]` (read as TIMESTAMP_NTZ). This spec
  * writes the SAME logical events both ways and asserts `ts_ms`/`ts_utc`
  * come out row-for-row identical, so a third encoding flip fails one
  * focused test instead of 46 queries.
  */
class ClockEncodingSpec extends SparkSpec {

  test("nanos-long and µs-timestamp encodings derive identical ts_ms/ts_utc") {
    val src = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        col("props"), col("ts_utc").as("canon_ts"))

    val base = java.nio.file.Files.createTempDirectory("graft-clock-enc").toString
    val nanosDir = s"$base/nanos"
    val microsDir = s"$base/micros"

    // Encoding A: int64 ns (what nanosAsLong turns TIMESTAMP(NANOS) into).
    src.withColumn("ts", (unix_micros(col("canon_ts")) * 1000L))
      .drop("canon_ts")
      .write.mode("overwrite").parquet(s"$nanosDir/events.parquet")
    // Encoding B: timestamp[us] without timezone (TIMESTAMP_NTZ on read).
    src.withColumn("ts", col("canon_ts").cast(TimestampNTZType))
      .drop("canon_ts")
      .write.mode("overwrite").parquet(s"$microsDir/events.parquet")

    val a = Tables.events(spark, nanosDir)
    val b = Tables.events(spark, microsDir)
    assert(a.schema("ts").dataType == LongType, "encoding A must exercise the Long-ns branch")
    assert(b.schema("ts").dataType == TimestampNTZType, "encoding B must exercise the NTZ branch")
    assert(a.schema("ts_ms").dataType == LongType)
    assert(b.schema("ts_ms").dataType == LongType)
    assert(a.schema("ts_utc").dataType == TimestampType)
    assert(b.schema("ts_utc").dataType == TimestampType)

    def canon(df: org.apache.spark.sql.DataFrame): Array[String] =
      df.select(col("event_id"), col("ts_ms"), unix_micros(col("ts_utc")).as("utc_us"))
        .orderBy("event_id").collect().map(_.toString)

    val (ca, cb) = (canon(a), canon(b))
    assert(ca.length == cb.length && ca.length > 0)
    assert(ca.sameElements(cb),
      "derived clocks differ between encodings: " +
        ca.zip(cb).collectFirst { case (x, y) if x != y => s"$x vs $y" }.getOrElse(""))

    // Cross-check a derived-consumer path too: per-user event counts by
    // UTC date partition must be encoding-invariant.
    def byDate(df: org.apache.spark.sql.DataFrame): Array[String] =
      df.groupBy(date_format(col("ts_utc"), "yyyy-MM-dd").as("d"))
        .count().orderBy("d").collect().map(_.toString)
    assert(byDate(a).sameElements(byDate(b)))
  }
}
