package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{ExactPercentile, StableAgg}

/** The metrics engine: rolling-window aggregates (SURVEY.md §2.4, A1-A9).
  *
  * The reference maintains 5 s sliding windows incrementally in deques
  * (reference/src/metrics/rolling.py:28-97); here the same aggregates are
  * declarative windowed aggregations — Spark's hash aggregation (batch) or
  * the streaming state store (Structured Streaming) maintain the state.
  * All functions below are mode-agnostic `DataFrame => DataFrame` where
  * possible.
  */
object WindowStats {

  /** A2+A3: exact floor-index percentiles of `valueCol` per group + window,
    * gated on a minimum sample count (rolling.py:99-111,125).
    */
  def percentileReport(
      events: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      minSamples: Int = 20,
      ps: Seq[Double] = Seq(0.5, 0.95, 0.99)): DataFrame = {
    val pcts = ExactPercentile(col(valueCol), ps).as("pcts")
    val base = events.groupBy(groupCols.map(col): _*)
      .agg(pcts, count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minSamples)              // A3 min-sample gate
    val named = ps.zipWithIndex.map { case (p, i) =>
      element_at(col("pcts"), i + 1).as(s"p${(p * 100).round}")
    }
    base.select(groupCols.map(col) ++ named :+ col("cnt"): _*)
  }

  /** A5/A9: per-key count/mean/sample-std/min/max of a Long-typed series
    * (rolling.py:172-184), with the reference's empty/singleton defaults.
    * Exact integer sums → bit-reproducible across partitionings.
    */
  def longSeriesStats(prefix: String, c: Column): Seq[Column] = Seq(
    count(c).as(s"${prefix}_count"),
    coalesce(StableAgg.lavg(c), lit(0.0)).as(s"${prefix}_mean_ms"),
    coalesce(StableAgg.lstdSamp(c), lit(0.0)).as(s"${prefix}_std_ms"),
    coalesce(min(c), lit(0L)).as(s"${prefix}_min_ms"),
    coalesce(max(c), lit(0L)).as(s"${prefix}_max_ms"))

  /** A6 (batch form): staleness = consecutive `ts_exchange_ms` gap per
    * (symbol, channel), ordered by arrival (rolling.py:85-94). The
    * streaming form lives in graft.streaming.StalenessStream.
    */
  def stalenessGaps(
      events: DataFrame,
      keyCols: Seq[String] = Seq("symbol", "channel"),
      tsCol: String = "ts_exchange_ms",
      arrivalCol: String = "ts_recv_mono_ns"): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(arrivalCol), col(tsCol))
    events
      .withColumn("stale_ms", col(tsCol) - lag(col(tsCol), 1).over(w))
      .filter(col("stale_ms").isNotNull)
  }

  /** A4: cumulative zero-latency counters and zero-rate %
    * (rolling.py:56-60,136-142): rate = zeros / max(1, total) * 100.
    */
  def zeroRate(events: DataFrame, latCol: String, groupCols: Seq[String]): DataFrame =
    events.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("total"),
        sum(when(col(latCol) === 0, 1L).otherwise(0L)).as("zeros"))
      .withColumn("zero_rate_pct",
        col("zeros").cast("double") / greatest(col("total"), lit(1L)) * 100.0d)

  /** A7/A8: per-symbol cumulative message counts, sorted (rolling.py:97,126). */
  def msgCounts(events: DataFrame, keyCol: String = "symbol"): DataFrame =
    events.groupBy(keyCol).agg(count(lit(1)).as("msg_count")).orderBy(keyCol)

  /** A5+A6+A8+A9: the CSV snapshot table (rolling.py:147-212) — per-key
    * latency stats FULL OUTER JOIN per-key staleness stats over the union
    * of key sets (rolling.py:152), zero defaults, sorted keys.
    */
  def csvSnapshot(
      latencies: DataFrame,   // rows with keyCols + lat col
      staleness: DataFrame,   // rows with keyCols + stale_ms (stalenessGaps)
      keyCols: Seq[String],
      latCol: String): DataFrame = {
    val lat = latencies.groupBy(keyCols.map(col): _*)
      .agg(longSeriesStats("lat", col(latCol)).head,
           longSeriesStats("lat", col(latCol)).tail: _*)
    val stale = staleness.groupBy(keyCols.map(col): _*)
      .agg(longSeriesStats("stale", col("stale_ms")).head,
           longSeriesStats("stale", col("stale_ms")).tail: _*)
    lat.join(stale, keyCols, "full_outer")
      .na.fill(0L, Seq("lat_count", "stale_count"))
      .na.fill(0.0,
        Seq("lat_mean_ms", "lat_std_ms", "stale_mean_ms", "stale_std_ms"))
      .na.fill(0L,
        Seq("lat_min_ms", "lat_max_ms", "stale_min_ms", "stale_max_ms"))
      .orderBy(keyCols.map(col): _*)
  }

  /** K6/D7/D8: the reference's exact 13-column CSV shape
    * (rolling.py:156-170) — generated_at_utc stamp first, floats
    * %.3f-formatted, keys sorted.
    */
  def csvSnapshotFormatted(snapshot: DataFrame): DataFrame = {
    def f3(c: String) = graft.operators.Derived.csvNum(col(c).cast("double")).as(c)
    snapshot.select(
      graft.operators.Derived.generatedAtUtc,
      col("symbol"), col("channel"),
      col("lat_count"), f3("lat_mean_ms"), f3("lat_std_ms"),
      f3("lat_min_ms"), f3("lat_max_ms"),
      col("stale_count"), f3("stale_mean_ms"), f3("stale_std_ms"),
      f3("stale_min_ms"), f3("stale_max_ms"))
  }
}
