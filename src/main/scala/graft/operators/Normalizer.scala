package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.Schemas

/** Raw OKX frame stream → normalized event stream (SURVEY.md §2.2, N1-N10).
  *
  * Input contract: a DataFrame (batch or streaming — the transform is
  * mode-agnostic) with columns
  *   raw: String                 — one JSON frame
  *   ts_recv_epoch_ms: Long      — ingest wall clock (S5)
  *   ts_recv_mono_ns: Long       — ingest monotonic clock (S5)
  *   ts_decoded_mono_ns: Long    — post-decode monotonic clock (S5)
  *   ts_proc_mono_ns: Long       — post-normalize monotonic clock (N7/N10)
  *
  * Output: Schemas.normalizedEventType rows, one per book snapshot or trade.
  *
  * Every skip-on-malformed branch of the reference maps to a null-producing
  * `try_*` expression followed by a filter, so the whole operator stays
  * inside WholeStageCodegen — no UDFs, no driver involvement, scales
  * linearly with input splits:
  *  - invalid JSON / non-object frame dropped  (okx_ws.py:78-81,92-94) → S6
  *  - control events dropped                   (normalizer.py:64-66)   → N1
  *  - envelope validation                      (normalizer.py:68-78)   → N2
  *  - channel dispatch books5/trades           (normalizer.py:82,161)  → N3
  *  - books5: data[0], ts cast-or-drop         (normalizer.py:84-91)   → N4
  *  - level parse, skip malformed levels       (normalizer.py:93-121)  → N5
  *  - best bid/ask head-of-array, 0.0 default  (normalizer.py:123-125) → N6
  *  - book payload assembly, n=5, exchange=okx (normalizer.py:127-159) → N7
  *  - trades: one message → N trade events     (normalizer.py:161-200) → N8
  *  - trade casts, skip malformed items        (normalizer.py:164-175) → N9
  */
object Normalizer {

  private val captureCols: Seq[Column] = Seq("ts_recv_epoch_ms",
    "ts_recv_mono_ns", "ts_decoded_mono_ns", "ts_proc_mono_ns").map(col)

  /** N5: [[px, sz, liq, cnt] strings] → [(price, size, count)] structs,
    * dropping levels that are too short or fail numeric parse
    * (reference/src/normalizer.py:97-121). Pure higher-order functions —
    * stays in codegen.
    */
  private def levelsExpr(side: String): Column = expr(
    s"""filter(
       |  transform(coalesce(item.$side, array()), lv ->
       |    CASE WHEN size(lv) >= 4 THEN named_struct(
       |      'price', try_cast(try_element_at(lv, 1) AS DOUBLE),
       |      'size',  try_cast(try_element_at(lv, 2) AS DOUBLE),
       |      'count', try_cast(try_element_at(lv, 4) AS INT)) END),
       |  lv -> lv IS NOT NULL AND lv.price IS NOT NULL
       |        AND lv.size IS NOT NULL AND lv.count IS NOT NULL)""".stripMargin)

  /** Decode (S6) + N1/N2 envelope filtering. Keeps the envelope struct. */
  def decode(raw: DataFrame): DataFrame = {
    raw
      .withColumn("msg", from_json(col("raw"), Schemas.rawEnvelopeType))
      // S6: invalid JSON → null struct → dropped
      .filter(col("msg").isNotNull)
      // N1: control events dropped (subscribe/unsubscribe/error)
      .filter(col("msg.event").isNull ||
        !col("msg.event").isin("subscribe", "unsubscribe", "error"))
      // N2: envelope validation
      .filter(col("msg.arg.channel").isNotNull &&
        col("msg.arg.instId").isNotNull &&
        col("msg.data").isNotNull && size(col("msg.data")) > 0)
  }

  /** books5 branch: N3 (dispatch) + N4 + N5 + N6 + N7.
    * `passthrough` columns from the input survive into the output (useful
    * for lineage ids / replay bookkeeping; the reference has no analog).
    */
  def normalizeBooks(decoded: DataFrame, passthrough: Seq[String] = Nil): DataFrame = {
    val books = decoded
      .filter(col("msg.arg.channel") === "books5")
      // N4: books5 uses data[0] only (normalizer.py:84)
      .withColumn("item", expr("try_element_at(msg.data, 1)"))
      .withColumn("ts_exchange_ms", expr("try_cast(item.ts AS BIGINT)"))
      .filter(col("ts_exchange_ms").isNotNull) // drop event on bad ts (N4)
      .withColumn("bids", levelsExpr("bids"))
      .withColumn("asks", levelsExpr("asks"))

    val outCols: Seq[Column] = Seq(
      lit("okx").as("exchange"),                         // normalizer.py:149
      col("msg.arg.instId").as("symbol"),
      lit("books5").as("channel"),
      lit("book_topn").as("event_type"),                 // normalizer.py:152
      col("ts_exchange_ms")) ++ captureCols ++ Seq(
      struct(
        lit(5).as("n"),                                  // normalizer.py:129
        // N6: head-of-array with 0.0 default (normalizer.py:123-125)
        coalesce(expr("try_element_at(bids, 1).price"), lit(0.0)).as("best_bid"),
        coalesce(expr("try_element_at(asks, 1).price"), lit(0.0)).as("best_ask"),
        col("bids"),
        col("asks")).as("book"),
      lit(null).cast(Schemas.tradePayloadType).as("trade"))
    books.select(passthrough.map(col) ++ outCols: _*)
  }

  /** trades branch: N3 (dispatch) + N8 (flatMap/explode) + N9 (casts). */
  def normalizeTrades(decoded: DataFrame, passthrough: Seq[String] = Nil): DataFrame = {
    val trades = decoded
      .filter(col("msg.arg.channel") === "trades")
      // N8: one message → N trade events
      .select(passthrough.map(col) ++ Seq(col("msg.arg.instId").as("symbol"),
        explode(col("msg.data")).as("item")) ++ captureCols: _*)
      .withColumn("ts_exchange_ms", expr("try_cast(item.ts AS BIGINT)"))
      .withColumn("price", expr("try_cast(item.px AS DOUBLE)"))
      .withColumn("size", expr("try_cast(item.sz AS DOUBLE)"))
      // N9: skip item when ts/px/sz unparseable (normalizer.py:164-175)
      .filter(col("ts_exchange_ms").isNotNull &&
        col("price").isNotNull && col("size").isNotNull)

    val outCols: Seq[Column] = Seq(
      lit("okx").as("exchange"),                         // normalizer.py:190
      col("symbol"),
      lit("trades").as("channel"),
      lit("trade").as("event_type"),                     // normalizer.py:193
      col("ts_exchange_ms")) ++ captureCols ++ Seq(
      lit(null).cast(Schemas.bookPayloadType).as("book"),
      struct(
        col("price"), col("size"),
        col("item.side").as("side"),
        col("item.tradeId").as("trade_id")).as("trade"))
    trades.select(passthrough.map(col) ++ outCols: _*)
  }

  /** Full normalizer: decode + both channel branches unioned back into the
    * single fan-out stream (app.py:89-98). Unknown channels yield nothing
    * (normalizer.py:202).
    */
  def normalize(raw: DataFrame, passthrough: Seq[String] = Nil): DataFrame = {
    val decoded = decode(raw)
    normalizeBooks(decoded, passthrough)
      .unionByName(normalizeTrades(decoded, passthrough))
  }
}
