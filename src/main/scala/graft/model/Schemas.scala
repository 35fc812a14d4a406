package graft.model

import org.apache.spark.sql.types._

/** Engine schemas mirroring the reference's data model (SURVEY.md §1).
  *
  * The raw envelope matches what the OKX WebSocket delivers
  * (reference/src/normalizer.py:64-78); numerics arrive as strings and are
  * cast with skip-on-malformed semantics (normalizer.py:87-91,100-121,
  * 164-174). `NormalizedEvent` mirrors reference/src/normalizer.py:37-48
  * with the payload union (BookPayload | TradePayload) represented as two
  * nullable struct columns discriminated by `event_type` (SURVEY.md §1.4).
  */
object Schemas {

  /** One merged item schema for both channels; `from_json` (PERMISSIVE)
    * leaves the fields of the "other" channel null, which the channel
    * dispatch (N3) then ignores.
    */
  val rawItemType: StructType = StructType(Seq(
    StructField("ts", StringType),
    // books5 (normalizer.py:87-95): level = [px, sz, liquidated, count] strings
    StructField("bids", ArrayType(ArrayType(StringType))),
    StructField("asks", ArrayType(ArrayType(StringType))),
    // trades (normalizer.py:164-174)
    StructField("px", StringType),
    StructField("sz", StringType),
    StructField("side", StringType),
    StructField("tradeId", StringType)
  ))

  /** Raw OKX envelope: {event?, arg:{channel, instId}, data:[...]} */
  val rawEnvelopeType: StructType = StructType(Seq(
    StructField("event", StringType),
    StructField("arg", StructType(Seq(
      StructField("channel", StringType),
      StructField("instId", StringType)))),
    StructField("data", ArrayType(rawItemType))
  ))

  val bookLevelType: StructType = StructType(Seq(
    StructField("price", DoubleType, nullable = false),
    StructField("size", DoubleType, nullable = false),
    StructField("count", IntegerType, nullable = false)))

  val bookPayloadType: StructType = StructType(Seq(
    StructField("n", IntegerType, nullable = false),
    StructField("best_bid", DoubleType, nullable = false),
    StructField("best_ask", DoubleType, nullable = false),
    StructField("bids", ArrayType(bookLevelType)),
    StructField("asks", ArrayType(bookLevelType))))

  val tradePayloadType: StructType = StructType(Seq(
    StructField("price", DoubleType, nullable = false),
    StructField("size", DoubleType, nullable = false),
    StructField("side", StringType),
    StructField("trade_id", StringType)))

  /** Flat engine schema for the normalized stream (payload union flattened
    * into nullable `book` / `trade` structs, SURVEY.md §1.4).
    */
  val normalizedEventType: StructType = StructType(Seq(
    StructField("exchange", StringType),
    StructField("symbol", StringType),
    StructField("channel", StringType),
    StructField("event_type", StringType),
    StructField("ts_exchange_ms", LongType),
    StructField("ts_recv_epoch_ms", LongType),
    StructField("ts_recv_mono_ns", LongType),
    StructField("ts_decoded_mono_ns", LongType),
    StructField("ts_proc_mono_ns", LongType),
    StructField("book", bookPayloadType),
    StructField("trade", tradePayloadType)))
}

/** Typed views for Dataset[T] ergonomics where compile-time fields help. */
case class BookLevel(price: Double, size: Double, count: Int)
case class BookPayload(n: Int, best_bid: Double, best_ask: Double,
    bids: Seq[BookLevel], asks: Seq[BookLevel])
case class TradePayload(price: Double, size: Double, side: String,
    trade_id: Option[String])
case class NormalizedEvent(
    exchange: String,
    symbol: String,
    channel: String,
    event_type: String,
    ts_exchange_ms: Long,
    ts_recv_epoch_ms: Long,
    ts_recv_mono_ns: Long,
    ts_decoded_mono_ns: Long,
    ts_proc_mono_ns: Long,
    book: Option[BookPayload],
    trade: Option[TradePayload])
