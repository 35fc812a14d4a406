package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-event derived scalar expressions (SURVEY.md §2.3, D1-D8).
  *
  * All pure column arithmetic — codegen'd, no shuffle, no state.
  */
object Derived {

  /** D1: exchange→receive latency in ms (rolling.py:52, stdout.py:16). */
  val latExToRecvMs: Column =
    (col("ts_recv_epoch_ms") - col("ts_exchange_ms")).as("lat_ex_to_recv_ms")

  /** D2: receive→decode latency in ns (rolling.py:53). */
  val latRecvToDecodeNs: Column =
    (col("ts_decoded_mono_ns") - col("ts_recv_mono_ns")).as("lat_recv_to_decode_ns")

  /** D3: decode→process latency in ns (rolling.py:54). */
  val latDecodeToProcNs: Column =
    (col("ts_proc_mono_ns") - col("ts_decoded_mono_ns")).as("lat_decode_to_proc_ns")

  /** D4: bid/ask spread (stdout.py:21). */
  val spread: Column = (col("book.best_ask") - col("book.best_bid")).as("spread")

  /** D5: UTC date partition key from the ingest clock (jsonl.py:20-28).
    * Session timezone must be UTC (GraftSession sets it).
    */
  val eventDate: Column =
    date_format(timestamp_millis(col("ts_recv_epoch_ms")), "yyyy-MM-dd")
      .as("event_date")

  /** Attach D1-D3 (+ D4/D5 for book events) to a normalized stream. */
  def withLatencies(events: DataFrame): DataFrame =
    events
      .withColumn("lat_ex_to_recv_ms", latExToRecvMs)
      .withColumn("lat_recv_to_decode_ns", latRecvToDecodeNs)
      .withColumn("lat_decode_to_proc_ns", latDecodeToProcNs)

  /** D6: the reference's per-event console line (stdout.py:22-32), built
    * with codegen'd `format_string` — book and trade shapes.
    */
  val consoleLine: Column = {
    val lat = Seq(
      col("lat_ex_to_recv_ms"),
      col("lat_recv_to_decode_ns") / 1000.0d,
      col("lat_decode_to_proc_ns") / 1000.0d)
    when(col("event_type") === "book_topn",
      format_string("%s | bid=%.2f ask=%.2f spread=%.2f | Ex→Recv=%dms Recv→Decode=%.3fus Decode→Proc=%.3fus",
        (Seq(col("symbol"), col("book.best_bid"), col("book.best_ask"),
          col("book.best_ask") - col("book.best_bid")) ++ lat): _*))
    .otherwise(
      format_string("%s | trade %s price=%.2f size=%.6f | Ex→Recv=%dms Recv→Decode=%.3fus Decode→Proc=%.3fus",
        (Seq(col("symbol"), col("trade.side"), col("trade.price"),
          col("trade.size")) ++ lat): _*))
  }

  /** D8: UTC ISO-8601 generated-at stamp (rolling.py:150). */
  val generatedAtUtc: Column =
    date_format(current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss.SSSSSSxxx")
      .as("generated_at_utc")
}
