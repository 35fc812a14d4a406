package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins — the last Structured Streaming operator family
  * the engine exposes (aggregation, sessionization, dedup, and arbitrary
  * state are covered by MetricsStream / StalenessStream / Bars / Dedup).
  *
  * The attribution join is the canonical shape: an impressions stream and
  * a clicks stream, matched per user when the click lands inside the
  * impression's attribution horizon. Both sides buffer in the state
  * store keyed by the equi-join column; rows match across micro-batch
  * boundaries, and the event-time range condition plus the watermark
  * bound state: a buffered impression is dropped once the watermark
  * passes `i_time + horizon`, a click once it passes `c_time` — so state
  * is O(events inside the horizon window), independent of stream length.
  */
object Joins {

  /** Watermarked stream-stream interval join.
    *
    * Contract: `imps` has columns (imp_id, i_user, i_time) with a
    * watermark on `i_time`; `clicks` has (clk_id, c_user, c_time) with a
    * watermark on `c_time`. Emits one row per (impression, click) pair
    * with `c_time` in `[i_time, i_time + horizon]`, in append mode.
    *
    * `joinType = "leftOuter"` adds the unconverted impressions: an
    * impression with no click in its horizon emits ONCE with a null
    * click — but only after the global watermark (the min across both
    * inputs) passes `i_time + horizon`, the point at which no future
    * click can still match it. That deferred-null emission is the
    * semantic difference between a streaming and a batch outer join,
    * and exactly what q137 gates. `"fullOuter"` adds the orphan clicks
    * too (flushed once the watermark passes their own event time —
    * q236); `user_id` coalesces across sides so orphan rows keep their
    * key.
    */
  def attribution(imps: DataFrame, clicks: DataFrame, horizon: String,
      joinType: String = "inner"): DataFrame =
    imps.join(clicks,
      col("i_user") === col("c_user") &&
        col("c_time") >= col("i_time") &&
        col("c_time") <= col("i_time") + expr(s"interval $horizon"),
      joinType)
      .select(col("imp_id"), col("clk_id"),
        coalesce(col("i_user"), col("c_user")).as("user_id"))
}
