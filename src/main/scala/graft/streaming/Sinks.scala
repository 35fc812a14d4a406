package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

import graft.operators.Derived

/** The reference's three sinks (SURVEY.md §2.5), Spark-first.
  *
  * K7 (fan-out with per-sink error isolation): each sink is its own
  * streaming query with its own checkpoint — one failing sink can't stall
  * the others, improving on the reference's sequential fan-out
  * (reference/src/app.py:94-98).
  */
object Sinks {

  /** K5: union-flattening JSON serializer, byte-compatible with
    * reference/src/sinks/jsonl.py:32-70 — book levels re-encoded as
    * [price, size, count] arrays with count as a bare integer, payload
    * shape keyed by event_type, compact separators. Spark's `to_json`
    * cannot mix int/double inside one JSON array, so the line is built
    * from codegen'd string concatenation (no UDF). Doubles render through
    * [[graft.functions.PyDoubleRepr]] — CPython-repr layout (plain decimal
    * in [1e-4, 1e16), `1e-05`-style scientific outside), so sub-millesimal
    * sizes and >=1e7 values stay byte-identical to json.dumps, not just
    * the JVM's narrower plain range; symbols/sides/ids are assumed
    * JSON-safe (they are in the OKX feed).
    */
  def jsonLine: Column = {
    def d(c: Column): Column = org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.PyDoubleRepr(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)))
    def levels(c: Column): Column = concat(lit("["),
      concat_ws(",", transform(c, l => concat(
        lit("["), d(l.getField("price")), lit(","), d(l.getField("size")),
        lit(","), l.getField("count").cast("string"), lit("]")))),
      lit("]"))
    val head = concat(
      lit("{\"exchange\":\""), col("exchange"),
      lit("\",\"symbol\":\""), col("symbol"),
      lit("\",\"channel\":\""), col("channel"),
      lit("\",\"event_type\":\""), col("event_type"),
      lit("\",\"ts_exchange_ms\":"), col("ts_exchange_ms").cast("string"),
      lit(",\"ts_recv_epoch_ms\":"), col("ts_recv_epoch_ms").cast("string"),
      lit(",\"ts_recv_mono_ns\":"), col("ts_recv_mono_ns").cast("string"),
      lit(",\"ts_decoded_mono_ns\":"), col("ts_decoded_mono_ns").cast("string"),
      lit(",\"ts_proc_mono_ns\":"), col("ts_proc_mono_ns").cast("string"),
      lit(",\"payload\":"))
    val bookPayload = concat(
      lit("{\"n\":"), col("book.n").cast("string"),
      lit(",\"best_bid\":"), d(col("book.best_bid")),
      lit(",\"best_ask\":"), d(col("book.best_ask")),
      lit(",\"bids\":"), levels(col("book.bids")),
      lit(",\"asks\":"), levels(col("book.asks")), lit("}"))
    val tradePayload = concat(
      lit("{\"price\":"), d(col("trade.price")),
      lit(",\"size\":"), d(col("trade.size")),
      lit(",\"side\":\""), col("trade.side"),
      lit("\",\"trade_id\":"),
      when(col("trade.trade_id").isNull, lit("null"))
        .otherwise(concat(lit("\""), col("trade.trade_id"), lit("\""))),
      lit("}"))
    concat(head,
      when(col("event_type") === "book_topn", bookPayload).otherwise(tradePayload),
      lit("}")).as("value")
  }

  /** K3/K4: partitioned JSONL file sink —
    * `{root}/exchange=okx/channel=.../event_date=.../symbol=.../part-*.json`.
    * Layout is Spark's `partitionBy` convention (`symbol=X/` directories vs
    * the reference's `X.jsonl` files — a cosmetic deviation; the partition
    * keys and line format are identical). The time bound of the
    * reference's flush policy maps to the trigger interval; the 100-event
    * count bound has no micro-batch analog (documented deviation, K4).
    */
  def jsonl(events: DataFrame, root: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second")): DataStreamWriter[org.apache.spark.sql.Row] = {
    events
      .withColumn("event_date", Derived.eventDate)
      .select(col("exchange"), col("channel"), col("event_date"), col("symbol"),
        jsonLine)
      .writeStream
      .format("text")
      .partitionBy("exchange", "channel", "event_date", "symbol")
      .option("path", root)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
  }

  /** K2: formatted console lines (stdout sink shape). */
  def console(events: DataFrame,
      trigger: Trigger = Trigger.ProcessingTime("1 second")): DataStreamWriter[org.apache.spark.sql.Row] =
    Derived.withLatencies(events)
      .select(Derived.consoleLine.as("event_line"))
      .writeStream
      .format("console")
      .option("truncate", "false")
      .trigger(trigger)

  /** K6: CSV metrics snapshot — full-overwrite single file via
    * foreachBatch: write to a temp dir, then atomically move the single
    * part file over `metrics_summary.csv` (reference/src/metrics/
    * rolling.py:147-212 overwrite semantics).
    */
  def csvSnapshot(snapshot: DataFrame, outFile: String, checkpoint: String,
      intervalSecs: Int = 30): DataStreamWriter[org.apache.spark.sql.Row] = {
    snapshot.writeStream
      .outputMode("complete")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(s"$intervalSecs seconds"))
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        writeSnapshotCsv(df, outFile)
      }
  }

  /** Batch helper shared by the streaming sink and shutdown flush.
    *
    * The temp dir is unique PER INVOCATION: the periodic export and a
    * shutdown flush may overlap, and a shared tmp path lets one
    * invocation delete the directory out from under the other's write
    * task (observed as a FileFormatWriter task abort at stop). With
    * unique tmps each write is isolated and the atomic move keeps
    * last-mover-wins snapshot semantics.
    */
  def writeSnapshotCsv(df: DataFrame, outFile: String): Unit = {
    val out = Paths.get(outFile)
    if (out.getParent != null) Files.createDirectories(out.getParent)
    val tmp = outFile + ".tmp-" + java.util.UUID.randomUUID().toString.take(8)
    try {
      df.coalesce(1).write.mode("overwrite").option("header", "true").csv(tmp)
      val part = Files.list(Paths.get(tmp)).filter(_.getFileName.toString.startsWith("part-"))
        .findFirst()
      if (part.isPresent) {
        Files.move(part.get, out, StandardCopyOption.REPLACE_EXISTING,
          StandardCopyOption.ATOMIC_MOVE)
      }
    } finally {
      if (Files.exists(Paths.get(tmp))) {
        Files.walk(Paths.get(tmp)).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => Files.deleteIfExists(p))
      }
    }
  }
}
