package graft.streaming

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Gap-based sessionization on Spark 4's transformWithState API with
  * EVENT-TIME TIMERS — the part of the arbitrary-state surface that
  * q133's staleness fold (pure ValueState) does not touch: a session
  * that never sees another event can only close when the WATERMARK
  * passes its gap horizon, which is exactly what `registerTimer` +
  * `handleExpiredTimer` exist for. Semantics mirror `session_window`
  * with a 30-minute gap (q36/q111): an event `gap` or more after the
  * session's last event starts a new session; `session_end = last event
  * + gap`.
  *
  * State per key is one fixed-size record (start, end, count, running
  * decimal total) plus at most ONE registered timer (re-armed per
  * batch) — constant per key, any key cardinality. The value total
  * accumulates in decimal(scale 6) over each double's shortest
  * round-trip digits — bit-identical to StableAgg.dsum / the oracle's
  * decimal route, carried through the state store as a String so no
  * encoder touches the decimal representation.
  */
object SessionsTws {

  case class SessEvent(user_id: Long, ts_ms: Long, value: Double)
  case class SessState(start: Long, end: Long, cnt: Long, total: String)
  case class SessOut(user_id: Long, session_start_ms: Long,
      session_end_ms: Long, cnt: Long, total_value: Double)

  class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, SessEvent, SessOut] {
    @transient private var cur: ValueState[SessState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cur = getHandle.getValueState[SessState]("session",
        Encoders.product[SessState], TTLConfig.NONE)

    private def dec(v: Double): JBigDecimal =
      new JBigDecimal(java.lang.Double.toString(v))
        .setScale(6, RoundingMode.HALF_UP)

    private def closed(key: Long, s: SessState): SessOut =
      SessOut(key, s.start, s.end + gapMs, s.cnt,
        new JBigDecimal(s.total).doubleValue())

    override def handleInputRows(key: Long, rows: Iterator[SessEvent],
        timerValues: TimerValues): Iterator[SessOut] = {
      val sorted = rows.toSeq.sortBy(_.ts_ms)
      var st = if (cur.exists()) Option(cur.get()) else None
      val out = Seq.newBuilder[SessOut]
      sorted.foreach { e =>
        st match {
          case Some(s) if e.ts_ms - s.end < gapMs =>
            st = Some(SessState(s.start, math.max(s.end, e.ts_ms), s.cnt + 1,
              new JBigDecimal(s.total).add(dec(e.value)).toPlainString))
          case other =>
            other.foreach(s => out += closed(key, s))
            st = Some(SessState(e.ts_ms, e.ts_ms, 1L, dec(e.value).toPlainString))
        }
      }
      st.foreach { s =>
        cur.update(s)
        // re-arm the single close timer at this session's gap horizon
        getHandle.listTimers().toSeq.foreach(t =>
          getHandle.deleteTimer(t.asInstanceOf[Long]))
        getHandle.registerTimer(s.end + gapMs)
      }
      out.result().iterator
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessOut] = {
      if (cur.exists()) {
        val s = cur.get()
        if (expiredTimerInfo.getExpiryTimeInMs >= s.end + gapMs) {
          cur.clear()
          Iterator.single(closed(key, s))
        } else Iterator.empty
      } else Iterator.empty
    }
  }

  /** events: (user_id, ts_ms, value) with a watermark on an event-time
    * column derived from ts_ms; emits closed sessions in append mode.
    */
  def sessions(events: DataFrame, gapMs: Long = 1800000L): Dataset[SessOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("ts_ms"), col("value"))
      .as[SessEvent]
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
