package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType, TimestampNTZType}

/** Property: `Tables.events` yields IDENTICAL derived clocks regardless of
  * the fixture's physical `ts` encoding.
  *
  * The harness has shipped `ts` as TIMESTAMP(NANOS) (read as Long ns via
  * `nanosAsLong` — physically indistinguishable from a plain int64 column
  * to the reader) and as `timestamp[us]` (read as TIMESTAMP_NTZ). This spec
  * writes the SAME logical events in four encodings — int64-ns,
  * timestamp[us] NTZ, timestamp[ms] UTC-adjusted, timestamp[us]
  * UTC-adjusted — and asserts `ts_ms`/`ts_utc` come out row-for-row
  * identical, so the NEXT encoding flip (the round-6 incident's root cause)
  * fails one focused test instead of 46 queries.
  */
class ClockEncodingSpec extends SparkSpec {

  private def withTempDir[A](f: String => A): A = {
    val base = java.nio.file.Files.createTempDirectory("graft-clock-enc")
    try f(base.toString)
    finally { // recursive delete — the leaked parquet copies add up per run
      import java.nio.file.{Files, Path}
      import scala.jdk.CollectionConverters._
      Files.walk(base).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_: Path))
    }
  }

  /** Write `src` (with canonical TimestampType column `canon_ts`) as an
    * events.parquet fixture under `dir`, with `ts` encoded per `mode`. */
  private def writeEncoded(src: org.apache.spark.sql.DataFrame, dir: String, mode: String): Unit = {
    val out = mode match {
      case "ns"  => src.withColumn("ts", unix_micros(col("canon_ts")) * 1000L)
      case "ntz" => src.withColumn("ts", col("canon_ts").cast(TimestampNTZType))
      case "ms" | "us" => src.withColumn("ts", col("canon_ts"))
    }
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    try {
      mode match {
        case "ms" => spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MILLIS")
        case "us" => spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        case _ =>
      }
      out.drop("canon_ts").write.mode("overwrite").parquet(s"$dir/events.parquet")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
      case None    => spark.conf.unset("spark.sql.parquet.outputTimestampType")
    }
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Array[String] =
    df.select(col("event_id"), col("ts_ms"), unix_micros(col("ts_utc")).as("utc_us"))
      .orderBy("event_id").collect().map(_.toString)

  test("nanos-long and µs-timestamp encodings derive identical ts_ms/ts_utc") {
    withTempDir { base =>
      val src = Tables.events(spark, "/root/testdata/sf0.001")
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
          col("props"), col("ts_utc").as("canon_ts"))

      val nanosDir = s"$base/nanos"
      val microsDir = s"$base/micros"
      writeEncoded(src, nanosDir, "ns")
      writeEncoded(src, microsDir, "ntz")

      val a = Tables.events(spark, nanosDir)
      val b = Tables.events(spark, microsDir)
      assert(a.schema("ts").dataType == LongType, "encoding A must exercise the Long-ns branch")
      assert(b.schema("ts").dataType == TimestampNTZType, "encoding B must exercise the NTZ branch")
      assert(a.schema("ts_ms").dataType == LongType)
      assert(b.schema("ts_ms").dataType == LongType)
      assert(a.schema("ts_utc").dataType == TimestampType)
      assert(b.schema("ts_utc").dataType == TimestampType)
      // Loader schema ordering must be encoding-invariant too (a SELECT-* /
      // full-row consumer would otherwise diverge between fixtures).
      assert(a.columns.sameElements(b.columns),
        s"encoding-dependent column order: ${a.columns.mkString(",")} vs ${b.columns.mkString(",")}")

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

  test("four encodings (int64-ns, NTZ-µs, ms, µs-with-tz) derive identical clocks") {
    withTempDir { base =>
      // timestamp[ms] is lossy below a millisecond, so the four-way identity
      // is asserted on ms-aligned instants: truncate the canonical clock to
      // ms first, then every encoding represents the SAME logical instant.
      val src = Tables.events(spark, "/root/testdata/sf0.001")
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
          col("props"),
          timestamp_millis((unix_micros(col("ts_utc")) / lit(1000L)).cast(LongType))
            .as("canon_ts"))

      val modes = Seq("ns", "ntz", "ms", "us")
      val loaded = modes.map { m =>
        val dir = s"$base/$m"
        writeEncoded(src, dir, m)
        m -> Tables.events(spark, dir)
      }
      val byMode = loaded.toMap
      // Each encoding must land in the branch it is meant to exercise.
      assert(byMode("ns").schema("ts").dataType == LongType)
      assert(byMode("ntz").schema("ts").dataType == TimestampNTZType)
      assert(byMode("ms").schema("ts").dataType == TimestampType,
        "timestamp[ms] UTC-adjusted must read back as TimestampType")
      assert(byMode("us").schema("ts").dataType == TimestampType,
        "timestamp[us] UTC-adjusted must read back as TimestampType")

      val canons = loaded.map { case (m, df) => m -> canon(df) }
      val (refMode, ref) = canons.head
      assert(ref.length > 0)
      canons.tail.foreach { case (m, c) =>
        assert(c.length == ref.length, s"$m row count ${c.length} != $refMode ${ref.length}")
        assert(c.sameElements(ref),
          s"derived clocks differ $refMode vs $m: " +
            ref.zip(c).collectFirst { case (x, y) if x != y => s"$x vs $y" }.getOrElse(""))
      }
      // Column order invariant across all four.
      val cols = loaded.map(_._2.columns.mkString(","))
      assert(cols.distinct.size == 1, s"encoding-dependent column order: ${cols.distinct.mkString(" | ")}")
    }
  }
}
