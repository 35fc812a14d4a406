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

  /** CPython `f"{x:.precf}"` fixed formatting — see
    * [[graft.functions.PyFormatFixed]]. Java's `format_string` rounds
    * HALF_UP and so diverges from the reference's f-strings on dyadic
    * midpoints (0.125 → "0.13" vs Python "0.12").
    */
  def pyFixed(c: Column, prec: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.PyFormatFixed(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(c), prec))

  /** D6: the reference's per-event console line (stdout.py:22-32), book
    * and trade shapes, byte-identical to the Python f-strings (incl.
    * ties-to-even fixed rounding via [[pyFixed]]).
    */
  val consoleLine: Column = {
    val latTail = concat(
      lit(" | Ex→Recv="), col("lat_ex_to_recv_ms").cast("string"),
      lit("ms Recv→Decode="), pyFixed(col("lat_recv_to_decode_ns") / 1000.0d, 3),
      lit("us Decode→Proc="), pyFixed(col("lat_decode_to_proc_ns") / 1000.0d, 3),
      lit("us"))
    when(col("event_type") === "book_topn",
      concat(col("symbol"), lit(" | bid="), pyFixed(col("book.best_bid"), 2),
        lit(" ask="), pyFixed(col("book.best_ask"), 2),
        lit(" spread="), pyFixed(col("book.best_ask") - col("book.best_bid"), 2),
        latTail))
    .otherwise(
      concat(col("symbol"), lit(" | trade "), col("trade.side"),
        lit(" price="), pyFixed(col("trade.price"), 2),
        lit(" size="), pyFixed(col("trade.size"), 6),
        latTail))
  }

  /** D7: CSV numeric formatting `%.3f` (rolling.py:203-211) — Python
    * f-string semantics, same rationale as [[consoleLine]].
    */
  def csvNum(c: Column): Column = pyFixed(c, 3)

  /** D8: UTC ISO-8601 generated-at stamp (rolling.py:150). */
  val generatedAtUtc: Column =
    date_format(current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss.SSSSSSxxx")
      .as("generated_at_utc")
}
