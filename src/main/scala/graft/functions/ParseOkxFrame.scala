package graft.functions

import com.fasterxml.jackson.core.{JsonFactory, JsonParser, JsonToken}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.model.Schemas

/** Native whole-frame normalizer: one raw OKX WebSocket JSON frame →
  * `array<struct<symbol, channel, event_type, ts_exchange_ms, book, trade>>`
  * in a single streaming-Jackson pass (no intermediate envelope tree).
  *
  * Replaces `from_json(rawEnvelopeType)` + the declarative event-builder
  * (see [[graft.operators.Normalizer.normalizeDeclarative]]): identical
  * semantics, ~10x less CPU per frame — `from_json` materializes the full
  * nested envelope (array<array<string>> levels and all unused fields)
  * before any of it is inspected, while this parser emits final event
  * structs directly and skips dead subtrees.
  *
  * Skip matrix (reference/src/normalizer.py:51-202 + okx_ws.py:72-94):
  *  - malformed JSON / non-object root → no events (okx_ws.py:78-81,92-94)
  *  - event ∈ {subscribe, unsubscribe, error} → no events (normalizer.py:64-66)
  *  - missing/empty channel or instId, missing/empty/non-array data → no
  *    events (normalizer.py:68-78; Python truthiness: "" also drops)
  *  - unknown channel → no events (normalizer.py:202)
  *  - books5: data[0] only; ts = get("ts","0"), unparseable → frame dropped
  *    (normalizer.py:84-91); level != 4+-element array or non-numeric
  *    px/sz/count → level skipped (:100-121); best_bid/ask = first level
  *    price else 0.0 (:123-125); n = 5 (:129)
  *  - trades: one event per data item; ts = get("ts","0"), unparseable →
  *    item skipped (:164-168); missing/unparseable px/sz → item skipped
  *    (the reference would raise on a missing key, normalizer.py:171-172 —
  *    we drop, matching our tolerant-cast contract); side/tradeId nullable
  *    passthrough (:173-174)
  *
  * Numeric casts mirror the engine's `try_cast` domain: trimmed
  * `Long.parseLong` / `Double.parseDouble`, null on failure — identical to
  * Python `int()`/`float()` on the wire's plain decimal strings. JSON
  * numbers (unquoted) are accepted via their literal text, as `from_json`
  * into a StringType field does.
  *
  * Field order in the frame is free: the hot path processes `data` inline
  * once `arg` is known; the rare arg-after-data frame falls back to a
  * second pass over the same bytes.
  */
case class ParseOkxFrame(child: Expression)
    extends UnaryExpression with CodegenFallback {

  import ParseOkxFrame._

  override def dataType: DataType = outputType
  override def nullable: Boolean = false

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    try parseFrame(bytes)
    catch { case _: Exception => EMPTY } // malformed JSON → no events (S6)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "parse_okx_frame"
}

object ParseOkxFrame {

  val outputType: ArrayType = ArrayType(StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("channel", StringType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("ts_exchange_ms", LongType, nullable = false),
    StructField("book", Schemas.bookPayloadType),
    StructField("trade", Schemas.tradePayloadType))),
    containsNull = false)

  private val factory = new JsonFactory()
  private val EMPTY = new GenericArrayData(Array.empty[Any])
  private val U_BOOKS5 = UTF8String.fromString("books5")
  private val U_TRADES = UTF8String.fromString("trades")
  private val U_BOOK_TOPN = UTF8String.fromString("book_topn")
  private val U_TRADE = UTF8String.fromString("trade")
  private val EMPTY_LEVELS = new GenericArrayData(Array.empty[Any])

  private final val CH_NONE = 0
  private final val CH_BOOKS5 = 1
  private final val CH_TRADES = 2
  private final val CH_OTHER = 3

  private def parseLong(s: String): java.lang.Long = {
    if (s == null) return null
    try java.lang.Long.valueOf(s.trim)
    catch { case _: NumberFormatException => null }
  }

  private def parseDouble(s: String): java.lang.Double = {
    if (s == null) return null
    try java.lang.Double.valueOf(s.trim)
    catch { case _: NumberFormatException => null }
  }

  private def parseInt(s: String): java.lang.Integer = {
    if (s == null) return null
    try java.lang.Integer.valueOf(s.trim)
    catch { case _: NumberFormatException => null }
  }

  /** Text of a scalar token (string or number); null for JSON null /
    * non-scalars (caller skips structure separately).
    */
  private def scalarText(p: JsonParser): String = p.currentToken() match {
    case JsonToken.VALUE_STRING => p.getText
    case JsonToken.VALUE_NUMBER_INT | JsonToken.VALUE_NUMBER_FLOAT => p.getText
    case JsonToken.VALUE_TRUE => "true"
    case JsonToken.VALUE_FALSE => "false"
    case _ => null
  }

  /** scalarText that also consumes (skips) an object/array value, so the
    * parser never desyncs on an unexpectedly structured field.
    */
  private def scalarOrSkip(p: JsonParser): String =
    if (p.currentToken().isStructStart) { p.skipChildren(); null }
    else scalarText(p)

  /** Parse one frame; returns the event array (possibly empty). */
  private[functions] def parseFrame(bytes: Array[Byte]): GenericArrayData = {
    var channel = CH_NONE
    var channelStr: String = null
    var instId: String = null
    var controlEvent = false
    var dataSeen = false
    var dataBeforeArg = false
    // events built inline on the hot path (arg precedes data)
    var built: java.util.ArrayList[InternalRow] = null
    var bookTsFailed = false

    def scan(p: JsonParser, processData: Boolean): Unit = {
      if (p.nextToken() != JsonToken.START_OBJECT) throw MalformedFrame
      var t = p.nextToken()
      while (t != JsonToken.END_OBJECT) {
        if (t != JsonToken.FIELD_NAME) throw MalformedFrame
        val name = p.currentName()
        p.nextToken()
        name match {
          case "event" =>
            val v = scalarText(p)
            if (v == "subscribe" || v == "unsubscribe" || v == "error") controlEvent = true
            else if (p.currentToken().isStructStart) p.skipChildren()
          case "arg" =>
            if (p.currentToken() == JsonToken.START_OBJECT) {
              var at = p.nextToken()
              while (at != JsonToken.END_OBJECT) {
                val an = p.currentName()
                p.nextToken()
                an match {
                  case "channel" =>
                    channelStr = scalarOrSkip(p)
                    channel = channelStr match {
                      case null | "" => CH_NONE
                      case "books5"  => CH_BOOKS5
                      case "trades"  => CH_TRADES
                      case _         => CH_OTHER
                    }
                  case "instId" => instId = scalarOrSkip(p)
                  case _ => if (p.currentToken().isStructStart) p.skipChildren()
                }
                at = p.nextToken()
              }
            } else if (p.currentToken().isStructStart) p.skipChildren()
          case "data" =>
            if (p.currentToken() == JsonToken.START_ARRAY) {
              if (!processData || channel == CH_NONE && channelStr == null) {
                // envelope-only pass, or arg not seen yet → defer
                if (processData) dataBeforeArg = true
                var depth = 1
                var dt = p.nextToken()
                if (dt != JsonToken.END_ARRAY) dataSeen = true
                while (depth > 0) {
                  if (dt == null) throw MalformedFrame
                  if (dt.isStructStart) depth += 1
                  else if (dt.isStructEnd) depth -= 1
                  if (depth > 0) dt = p.nextToken()
                }
              } else {
                built = new java.util.ArrayList[InternalRow](4)
                processDataArray(p)
              }
            } else if (p.currentToken().isStructStart) { p.skipChildren() }
            // non-array data → stays !dataSeen → frame dropped
          case _ =>
            if (p.currentToken().isStructStart) p.skipChildren()
        }
        t = p.nextToken()
      }
    }

    def processDataArray(p: JsonParser): Unit = {
      var first = true
      var t = p.nextToken()
      while (t != JsonToken.END_ARRAY) {
        dataSeen = true
        if (t == JsonToken.START_OBJECT) {
          channel match {
            case CH_BOOKS5 =>
              if (first) processBookItem(p) else p.skipChildren()
            case CH_TRADES => processTradeItem(p)
            case _ => p.skipChildren() // unknown channel → no events
          }
        } else if (t.isStructStart) p.skipChildren()
        else channel match {
          case CH_BOOKS5 if first => bookTsFailed = true // non-object d0 → drop frame
          case _ => // trades: non-object item skipped
        }
        first = false
        t = p.nextToken()
      }
    }

    // books5 data[0] → one book_topn event (or frame drop on bad ts)
    def processBookItem(p: JsonParser): Unit = {
      var ts: String = null
      var tsPresent = false
      var bids: GenericArrayData = EMPTY_LEVELS
      var asks: GenericArrayData = EMPTY_LEVELS
      var t = p.nextToken()
      while (t != JsonToken.END_OBJECT) {
        val name = p.currentName()
        p.nextToken()
        name match {
          case "ts"   => ts = scalarOrSkip(p); tsPresent = true
          case "bids" => bids = parseLevels(p)
          case "asks" => asks = parseLevels(p)
          case _ => if (p.currentToken().isStructStart) p.skipChildren()
        }
        t = p.nextToken()
      }
      // get("ts","0"): absent → 0; present-but-null/structured → int()
      // TypeError → frame dropped (normalizer.py:87-91)
      val tsMs = if (!tsPresent) java.lang.Long.valueOf(0L) else parseLong(ts)
      if (tsMs == null) { bookTsFailed = true; return }
      val bestBid = if (bids.numElements() > 0) bids.getStruct(0, 3).getDouble(0) else 0.0
      val bestAsk = if (asks.numElements() > 0) asks.getStruct(0, 3).getDouble(0) else 0.0
      val book = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](5, bestBid, bestAsk, bids, asks))
      built.add(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](null, U_BOOKS5, U_BOOK_TOPN, tsMs.longValue(), book, null)))
    }

    // one side's levels: [[px, sz, liq, cnt], ...] → array<struct> (skip bad)
    def parseLevels(p: JsonParser): GenericArrayData = {
      if (p.currentToken() != JsonToken.START_ARRAY) {
        if (p.currentToken().isStructStart) p.skipChildren()
        return EMPTY_LEVELS // null / non-array side → [] (raw or [])
      }
      val out = new java.util.ArrayList[InternalRow](5)
      var t = p.nextToken()
      while (t != JsonToken.END_ARRAY) {
        if (t == JsonToken.START_ARRAY) {
          var px: String = null; var sz: String = null; var cnt: String = null
          var idx = 0
          var lt = p.nextToken()
          while (lt != JsonToken.END_ARRAY) {
            if (lt.isStructStart) p.skipChildren()
            else {
              if (idx == 0) px = scalarText(p)
              else if (idx == 1) sz = scalarText(p)
              else if (idx == 3) cnt = scalarText(p)
            }
            idx += 1
            lt = p.nextToken()
          }
          if (idx >= 4) {
            val pxD = parseDouble(px); val szD = parseDouble(sz); val cntI = parseInt(cnt)
            if (pxD != null && szD != null && cntI != null) {
              out.add(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
                Array[Any](pxD.doubleValue(), szD.doubleValue(), cntI.intValue())))
            }
          }
        } else if (t.isStructStart) p.skipChildren()
        t = p.nextToken()
      }
      if (out.isEmpty) EMPTY_LEVELS else new GenericArrayData(out.toArray)
    }

    // one trades item → one trade event (skip on bad ts/px/sz)
    def processTradeItem(p: JsonParser): Unit = {
      var ts: String = null; var tsPresent = false
      var px: String = null; var sz: String = null
      var side: String = null; var tradeId: String = null
      var t = p.nextToken()
      while (t != JsonToken.END_OBJECT) {
        val name = p.currentName()
        p.nextToken()
        name match {
          case "ts"      => ts = scalarOrSkip(p); tsPresent = true
          case "px"      => px = scalarOrSkip(p)
          case "sz"      => sz = scalarOrSkip(p)
          case "side"    => side = scalarOrSkip(p)
          case "tradeId" => tradeId = scalarOrSkip(p)
          case _ => if (p.currentToken().isStructStart) p.skipChildren()
        }
        t = p.nextToken()
      }
      // get("ts","0"): absent → 0; present-but-null → int() TypeError →
      // item skipped (normalizer.py:164-168)
      val tsMs = if (!tsPresent) java.lang.Long.valueOf(0L) else parseLong(ts)
      if (tsMs == null) return
      val pxD = parseDouble(px); val szD = parseDouble(sz)
      if (pxD == null || szD == null) return
      val trade = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](pxD.doubleValue(), szD.doubleValue(),
          if (side == null) null else UTF8String.fromString(side),
          if (tradeId == null) null else UTF8String.fromString(tradeId)))
      built.add(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](null, U_TRADES, U_TRADE, tsMs.longValue(), null, trade)))
    }

    val p = factory.createParser(bytes)
    try {
      scan(p, processData = true)
      // strict decode (msgspec, okx_ws.py:72-83): content after the root
      // object makes the whole frame undecodable → dropped. (from_json's
      // Jackson-based parse is lenient here — a documented difference of
      // the declarative cross-check path.)
      if (p.nextToken() != null) throw MalformedFrame
    } finally p.close()

    if (dataBeforeArg && !controlEvent &&
        (channel == CH_BOOKS5 || channel == CH_TRADES)) {
      // rare arg-after-data frame: one more pass, now with channel known
      val p2 = factory.createParser(bytes)
      try scan(p2, processData = true) finally p2.close()
    }

    // envelope validation (normalizer.py:64-78, Python truthiness)
    if (controlEvent || channel == CH_NONE || !dataSeen ||
        instId == null || instId.isEmpty || bookTsFailed ||
        built == null || built.isEmpty) return EMPTY

    val sym = UTF8String.fromString(instId)
    val arr = new Array[Any](built.size())
    var i = 0
    while (i < built.size()) {
      val r = built.get(i).asInstanceOf[org.apache.spark.sql.catalyst.expressions.GenericInternalRow]
      r.update(0, sym)
      arr(i) = r
      i += 1
    }
    new GenericArrayData(arr)
  }

  private object MalformedFrame extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
}
