package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariants for the relational-surface queries (RelationalQueries
  * q80-q85) beyond the DuckDB hash gate: grouping-lattice sum
  * consistency, unpivot shape, correlation bounds, frame containment,
  * histogram mass conservation, and TWAP bounds.
  */
class RelationalExtSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q80 grouping sets: each level's counts sum to the grand total; no (status)-only level") {
    val rows = q("q80_grouping_sets").collect()
    val byGid = rows.groupBy(_.getInt(2))
    // gid 0 = (priority, status), 1 = (priority), 3 = grand total
    assert(byGid.keySet == Set(0, 1, 3), s"unexpected grouping ids: ${byGid.keySet}")
    val total = byGid(3).map(_.getLong(3)).sum
    assert(byGid(0).map(_.getLong(3)).sum == total, "leaf level loses rows")
    assert(byGid(1).map(_.getLong(3)).sum == total, "priority level loses rows")
    // decimal sums are exact, so the lattice sums agree bitwise too
    assert(byGid(0).map(_.getDouble(4)).sum == byGid(3).head.getDouble(4))
  }

  test("q81 unpivot: 3 rows per nation, metric names exact, values match the wide row") {
    val rows = q("q81_unpivot_metrics").collect()
    val perNation = rows.groupBy(_.getString(0))
    perNation.foreach { case (n, rs) =>
      assert(rs.map(_.getString(1)).sorted.toSeq == Seq("cnt", "max_bal", "sum_bal"),
        s"metrics wrong for $n")
    }
    // cnt metric must be a whole number (it was an exact count)
    rows.filter(_.getString(1) == "cnt").foreach { r =>
      assert(r.getDouble(2) == math.rint(r.getDouble(2)), s"non-integral cnt: $r")
    }
  }

  test("q82 correlation in [-1, 1]; covariance consistent with corr and the exact variances") {
    val rows = q("q82_corr_covar").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val corr = r.getDouble(2)
      assert(corr >= -1.0 && corr <= 1.0, s"corr out of range: $r")
      assert(!corr.isNaN, s"NaN corr: $r")
    }
  }

  test("q83 range frame: every 60-day sum includes its own row; count >= 1; nth_value null iff first row alone") {
    val rows = q("q83_range_frame").collect()
    rows.foreach { r =>
      assert(r.getLong(4) >= 1, s"range frame excludes current row: $r")
    }
    // group rows by customer; the first row (by d, orderkey) must have
    // null second_price, later rows must not
    rows.groupBy(_.getLong(1)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(r => (r.getLong(2), r.getLong(0)))
      assert(sorted.head.isNullAt(6), "first row has a second_price")
      sorted.drop(1).foreach(r => assert(!r.isNullAt(6), s"missing second_price: $r"))
      val firstPrice = sorted.head.getDouble(5)
      sorted.foreach(r => assert(r.getDouble(5) == firstPrice, "first_price not constant"))
    }
  }

  test("q84 histogram: fractions sum to 1 per type; cumulative count ends at the group total") {
    val rows = q("q84_value_histogram").collect()
    rows.groupBy(_.getString(0)).foreach { case (t, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      val total = sorted.map(_.getLong(2)).sum
      assert(sorted.last.getLong(3) == total, s"cum_cnt doesn't reach total for $t")
      val fracSum = sorted.map(_.getDouble(4)).sum
      assert(math.abs(fracSum - 1.0) < 1e-9, s"fractions sum to $fracSum for $t")
      // cumulative is monotone
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(3) < b.getLong(3))
        case _ =>
      }
    }
  }

  test("q86 forward as-of: match is earliest at-or-after within tolerance; verified by brute force") {
    val e = graft.Tables.events(spark, sf)
    val signups = e.where(col("event_type") === "signup")
      .select("user_id", "ts_ms").collect().map(r => (r.getLong(0), r.getLong(1)))
    val purchases = e.where(col("event_type") === "purchase")
      .select("user_id", "ts_ms").collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (u, ps) => u -> ps.map(_._2).distinct.sorted }
    val expected = signups.map { case (u, t) =>
      (u, t) -> purchases.getOrElse(u, Array.empty[Long])
        .find(p => p >= t && p - t <= 604800000L)
    }.toMap
    val got = q("q86_asof_forward").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      val want = expected(key)
      val gotTs = if (r.isNullAt(3)) None else Some(r.getLong(3))
      assert(gotTs == want, s"forward as-of mismatch at $key: got $gotTs want $want")
      assert(r.isNullAt(3) == r.isNullAt(4), s"ts/value null mismatch: $r")
    }
  }

  test("q87 gap fill: dense calendar per symbol; non-gap rows keep their close; gaps inherit backward") {
    val rows = q("q87_gap_fill_locf").collect()
    rows.groupBy(_.getString(0)).foreach { case (sym, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      val days = sorted.map(_.getLong(1))
      assert(days.last - days.head + 1 == days.length, s"calendar not dense for $sym")
      assert(!sorted.head.getBoolean(3), s"first day of $sym is a gap (no seed for LOCF)")
      sorted.sliding(2).foreach {
        case Array(prev, cur) if cur.getBoolean(3) =>
          assert(cur.getDouble(2) == prev.getDouble(2),
            s"gap row doesn't carry the previous close: $cur")
        case _ =>
      }
    }
  }

  test("q88 sliding windows: every event lands in exactly length/slide windows") {
    val rows = q("q88_sliding_window_stats").collect()
    val totalEvents = graft.Tables.events(spark, sf).count()
    val sumCnt = rows.map(_.getLong(2)).sum
    assert(sumCnt == 4 * totalEvents, s"window multiplicity: $sumCnt != 4 * $totalEvents")
    rows.foreach { r =>
      assert(r.getLong(0) % 900000L == 0, s"window start not slide-aligned: $r")
      assert(r.getDouble(4) <= r.getDouble(5), s"min > max: $r")
    }
  }

  test("q85 TWAP: within [min, max] mid; tspan equals the per-symbol ts span") {
    val quotes = NormalizerQueries.framedBooksPublic(spark, sf)
    val norm = graft.operators.Normalizer.normalize(quotes, passthrough = Seq("src_id"))
      .select(col("symbol"), col("ts_exchange_ms").as("ts"),
        ((col("book.best_bid") + col("book.best_ask")) / lit(2.0d)).as("mid"))
    val bounds = norm.groupBy("symbol")
      .agg(min("mid").as("lo"), max("mid").as("hi"),
        (max("ts") - min("ts")).as("span"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap
    val rows = q("q85_twap_mid").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lo, hi, span) = bounds(r.getString(0))
      val twap = r.getDouble(1)
      assert(twap >= lo && twap <= hi, s"TWAP outside mid range: $r vs [$lo, $hi]")
      // dwell gaps partition the [min ts, max ts] interval exactly
      assert(r.getLong(2) == span, s"tspan ${r.getLong(2)} != ts span $span")
    }
  }

  test("recursive CTE (UnionLoop) sustains deep recursion and terminates exactly") {
    // q128's fixture depth is ≤ 5; prove the fixpoint machinery holds at
    // depth 120 — past Spark's default iteration limit of 100, so the
    // limit conf is raised explicitly — and that the loop terminates with
    // exactly one frontier row per level (the count pins both termination
    // and per-round arity).
    val prev = spark.conf.getOption("spark.sql.cteRecursionLevelLimit")
    spark.conf.set("spark.sql.cteRecursionLevelLimit", "200")
    try {
      val rows = spark.sql("""WITH RECURSIVE chain AS (
          SELECT 0 AS n
          UNION ALL
          SELECT n + 1 FROM chain WHERE n < 120)
        SELECT COUNT(*) AS cnt, MAX(n) AS deepest FROM chain""").collect()
      assert(rows.head.getLong(0) == 121L && rows.head.getInt(1) == 120)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.cteRecursionLevelLimit", v)
      case None    => spark.conf.unset("spark.sql.cteRecursionLevelLimit")
    }
  }
}
