package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.StableAgg

/** OHLC candle aggregation over event time — one logical definition for
  * both physical modes (the engine's design stance): in batch it compiles
  * to a partial/final HashAggregate per (symbol, window); under
  * Structured Streaming (with an upstream watermark on `event_time`) the
  * same plan keeps exactly ONE fixed-width state row per open bar in the
  * state store and emits each bar once its window closes (append mode).
  *
  * The reference pipeline stops at normalized events
  * (reference/src/normalizer.py); bars are the first analytics layer a
  * consumer builds on top, so they live here beside the metrics streams.
  */
object Bars {

  /** @param trades normalized trades carrying `symbol`, `ts_exchange_ms`,
    *               `price`, `sz`, and `event_time` (timestamp)
    * @param seqCol a per-(symbol, ts) unique BIGINT tie-break; combined
    *               with the timestamp into one packed long so
    *               min_by/max_by keep a fixed-width buffer (HashAggregate
    *               in batch, compact state rows when streaming). Callers
    *               must keep it under 2^20.
    * @param barWidth window duration, e.g. "1 day", "1 minute"
    */
  def ohlc(trades: DataFrame, seqCol: Column, barWidth: String = "1 day"): DataFrame = {
    // ts < 2^43 ms and seq < 2^20 pack into 63 bits; ANSI overflow raises
    // loudly rather than mis-ordering.
    val key = col("ts_exchange_ms") * 1048576L + seqCol
    trades
      .groupBy(col("symbol"), window(col("event_time"), barWidth).as("bar"))
      .agg(
        min_by(col("price"), key).as("open"),
        max(col("price")).as("high"),
        min(col("price")).as("low"),
        max_by(col("price"), key).as("close"),
        StableAgg.dsum(col("sz")).as("volume"),
        count(lit(1)).as("n_trades"))
      .select(col("symbol"), unix_millis(col("bar.start")).as("bar_start_ms"),
        col("open"), col("high"), col("low"), col("close"),
        col("volume"), col("n_trades"))
  }
}
