package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A6 streaming form: per-(symbol, channel) consecutive exchange-timestamp
  * gaps, the direct analog of the reference's `last_ts_exchange` dict +
  * deque update (reference/src/metrics/rolling.py:34-35,85-94).
  *
  * State per key is one Long (the last seen exchange timestamp) — constant
  * memory per key in the state store, scales to arbitrary key cardinality.
  * Events inside a micro-batch are sorted by arrival clock before folding,
  * mirroring the reference's arrival-order processing.
  */
object StalenessStream {

  case class StaleIn(symbol: String, channel: String,
      ts_exchange_ms: Long, ts_recv_mono_ns: Long)
  case class StaleGap(symbol: String, channel: String, stale_ms: Long,
      ts_recv_mono_ns: Long)
  case class LastTs(lastTsExchangeMs: Long)

  def gaps(events: DataFrame): Dataset[StaleGap] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("symbol"), col("channel"), col("ts_exchange_ms"), col("ts_recv_mono_ns"))
      .as[StaleIn]
      .groupByKey(e => (e.symbol, e.channel))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: (String, String), rows: Iterator[StaleIn], state: GroupState[LastTs]) => {
          val sorted = rows.toSeq.sortBy(e => (e.ts_recv_mono_ns, e.ts_exchange_ms))
          var last = if (state.exists) Some(state.get.lastTsExchangeMs) else None
          val out = sorted.flatMap { e =>
            val gap = last.map(l => StaleGap(e.symbol, e.channel,
              e.ts_exchange_ms - l, e.ts_recv_mono_ns))
            last = Some(e.ts_exchange_ms)
            gap
          }
          last.foreach(l => state.update(LastTs(l)))
          out.iterator
        })
  }
}
