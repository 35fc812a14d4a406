package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{OracleSql => O, Tables}
import graft.functions.StableAgg

/** Round-4 additions, part 3 — completing the relational surface (the
  * grouping family beyond ROLLUP/CUBE, UNPIVOT as the inverse of q70's
  * pivot, RANGE window frames and the first/nth-value family) plus two
  * exact-statistics operators (decimal-component Pearson correlation,
  * equi-width histograms) and the time-weighted average price a market
  * pipeline derives from the reference's book stream (the dwell-weighted
  * extension of spread D4, reference/src/sinks/stdout.py:21).
  *
  * Scale notes: every query here is a single shuffle-aggregate or a
  * single window pass over a pre-partitioned relation — no driver-side
  * collection, no cross-join, no iteration. The correlation query ships
  * six decimal partial sums per group (map-side combine); the histogram
  * ships |buckets| rows; the TWAP's window sort co-partitions with the
  * final per-symbol aggregate.
  */
object RelationalQueries extends Registry {

  /** GROUPING SETS via the Dataset API (`Dataset.groupingSets`, a
    * non-hierarchical subset CUBE/ROLLUP can't express: (priority,
    * status) + (priority) + grand total, but NOT (status)). Same Expand +
    * two-phase aggregate physical shape as q19/q60.
    */
  private val q80 = Q("q80_grouping_sets",
    (s, d) => {
      val p = col("o_orderpriority"); val st = col("o_orderstatus")
      Tables.orders(s, d)
        .groupingSets(Seq(Seq(p, st), Seq(p), Seq.empty), p, st)
        .agg((grouping(p) * 2 + grouping(st)).cast("int").as("gid"),
          count(lit(1)).as("n_orders"),
          StableAgg.dsum(col("o_totalprice")).as("total_price"))
        .select(coalesce(p, lit("ALL")).as("priority"),
          coalesce(st, lit("ALL")).as("status"),
          col("gid"), col("n_orders"), col("total_price"))
        .orderBy("gid", "priority", "status")
    },
    Some(s"""SELECT coalesce(o_orderpriority, 'ALL') AS priority,
        coalesce(o_orderstatus, 'ALL') AS status,
        CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS INTEGER) AS gid,
        COUNT(*) AS n_orders,
        ${O.dsum("o_totalprice")} AS total_price
      FROM orders
      GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderpriority), ())
      ORDER BY gid, priority, status"""))

  /** UNPIVOT (wide → long, the inverse of q70's pivot) over a per-nation
    * aggregate. The unpivot itself is a zero-shuffle Expand — rows
    * multiply locally by the number of measure columns.
    */
  private val q81 = Q("q81_unpivot_metrics",
    (s, d) => {
      val agg = Tables.customer(s, d)
        .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).cast("double").as("cnt"),
          StableAgg.dsum(col("c_acctbal")).as("sum_bal"),
          max(col("c_acctbal")).as("max_bal"))
      agg.unpivot(Array(col("n_name")),
          Array(col("cnt"), col("sum_bal"), col("max_bal")), "metric", "value")
        .orderBy("n_name", "metric")
    },
    Some(s"""WITH agg AS (
        SELECT n_name, CAST(COUNT(*) AS DOUBLE) AS cnt,
          ${O.dsum("c_acctbal")} AS sum_bal,
          MAX(c_acctbal) AS max_bal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name)
      SELECT n_name, metric, value
      FROM (UNPIVOT agg ON cnt, sum_bal, max_bal INTO NAME metric VALUE value)
      ORDER BY n_name, metric"""))

  /** Exact-decimal Pearson correlation + sample covariance per group.
    * Built-in `corr`/`covar_samp` accumulate doubles in partition order
    * (non-deterministic across engines AND across partitionings of the
    * same data); deriving both from six order-independent decimal sums
    * gives bit-identical results on any cluster layout — the only way a
    * 1000-executor run can reproduce a laptop run. sqrt/division are
    * IEEE-exact, so the final double arithmetic is safe.
    */
  private val q82 = Q("q82_corr_covar",
    (s, d) => {
      val x = col("l_quantity"); val y = col("l_extendedprice")
      // fanOut (r14): 5 decimal-route partial sums over 600k rows ran in the
      // single-split fixture scan task (cpu ≈ wall ≈ 2 s); no-op at scale
      Tables.fanOut(Tables.lineitem(s, d)).groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          StableAgg.dsum(x).as("sx"), StableAgg.dsum(y).as("sy"),
          StableAgg.dsum(x * y).as("sxy"),
          StableAgg.dsum(x * x).as("sxx"), StableAgg.dsum(y * y).as("syy"))
        .withColumn("nd", col("n").cast("double"))
        .select(col("l_returnflag"), col("n"),
          ((col("nd") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("nd") * col("sxx") - col("sx") * col("sx")) *
              sqrt(col("nd") * col("syy") - col("sy") * col("sy"))))
            .as("corr_qty_price"),
          ((col("sxy") - col("sx") * col("sy") / col("nd")) / (col("nd") - lit(1.0d)))
            .as("covar_samp"))
        .orderBy("l_returnflag")
    },
    Some(s"""WITH c AS (
        SELECT l_returnflag, COUNT(*) AS n,
          ${O.dsum("l_quantity")} AS sx,
          ${O.dsum("l_extendedprice")} AS sy,
          ${O.dsum("l_quantity * l_extendedprice")} AS sxy,
          ${O.dsum("l_quantity * l_quantity")} AS sxx,
          ${O.dsum("l_extendedprice * l_extendedprice")} AS syy
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, n,
        (CAST(n AS DOUBLE) * sxy - sx * sy) /
          (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx) *
           sqrt(CAST(n AS DOUBLE) * syy - sy * sy)) AS corr_qty_price,
        (sxy - sx * sy / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0::DOUBLE) AS covar_samp
      FROM c ORDER BY l_returnflag"""))

  /** Value-based RANGE window frame (±30 days around each order by the
    * SAME customer) — a frame kind q69's ROWS windows don't cover — plus
    * the first_value/nth_value family over an explicit ROWS frame with a
    * provably-unique ordering (d, o_orderkey). The range sum is
    * tie-insensitive by construction (RANGE includes all peers).
    */
  private val q83 = Q("q83_range_frame",
    (s, d) => {
      val o = Tables.orders(s, d)
        .withColumn("d",
          datediff(col("o_orderdate").cast("date"), to_date(lit("1990-01-01"))).cast("long"))
      val wRange = Window.partitionBy("o_custkey").orderBy("d").rangeBetween(-30, 30)
      val wRows = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
      o.select(col("o_orderkey"), col("o_custkey"), col("d"),
          StableAgg.dsumOver(col("o_totalprice"), wRange).as("sum_60d"),
          count(lit(1)).over(wRange).as("cnt_60d"),
          first(col("o_totalprice")).over(wRows).as("first_price"),
          nth_value(col("o_totalprice"), 2).over(wRows).as("second_price"))
        .orderBy("o_custkey", "d", "o_orderkey")
    },
    Some {
      val range = "(PARTITION BY o_custkey ORDER BY d RANGE BETWEEN 30 PRECEDING AND 30 FOLLOWING)"
      val rows = "(PARTITION BY o_custkey ORDER BY d, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
      s"""WITH o AS (
        SELECT o_orderkey, o_custkey,
          date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS d,
          o_totalprice
        FROM orders)
      SELECT o_orderkey, o_custkey, d,
        ${O.dsumOver("o_totalprice", range)} AS sum_60d,
        COUNT(*) OVER $range AS cnt_60d,
        first_value(o_totalprice) OVER $rows AS first_price,
        nth_value(o_totalprice, 2) OVER $rows AS second_price
      FROM o ORDER BY o_custkey, d, o_orderkey"""
    })

  /** Equi-width histogram with cumulative counts and per-group fractions
    * — the latency-distribution view the reference's percentile report
    * (reference/src/metrics/rolling.py:99-111) approximates from the
    * other direction. All-integer bucket arithmetic: floor(x/w) is one
    * deterministic IEEE division, counts are exact, and the fractions
    * divide two integer-derived doubles — no FP-accumulation anywhere.
    */
  private val q84 = Q("q84_value_histogram",
    (s, d) => {
      val b = Tables.events(s, d)
        .select(col("event_type"), floor(col("value") / lit(5.0d)).cast("long").as("bucket"))
        .groupBy("event_type", "bucket").agg(count(lit(1)).as("cnt"))
      val wCum = Window.partitionBy("event_type").orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
      val wTot = Window.partitionBy("event_type")
      b.select(col("event_type"), col("bucket"), col("cnt"),
          sum(col("cnt")).over(wCum).as("cum_cnt"),
          (col("cnt").cast("double") / sum(col("cnt")).over(wTot).cast("double")).as("frac"))
        .orderBy("event_type", "bucket")
    },
    Some("""WITH b AS (
        SELECT event_type, CAST(floor(value / 5.0::DOUBLE) AS BIGINT) AS bucket,
          COUNT(*) AS cnt
        FROM events GROUP BY 1, 2)
      SELECT event_type, bucket, cnt,
        CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY bucket
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cnt,
        CAST(cnt AS DOUBLE) /
          CAST(SUM(cnt) OVER (PARTITION BY event_type) AS DOUBLE) AS frac
      FROM b ORDER BY event_type, bucket"""))

  /** Time-weighted average mid price per symbol over the book mid-quote
    * stream (r14: reads [[AnalyticsQueries.booksDirect]], the lineitem-
    * direct relation q16's oracle proves value-identical to the
    * normalize output — the end-to-end books path stays gated by
    * q16/q68): each quote's mid is
    * weighted by its dwell time (ms until the next update of the same
    * symbol). The ordering key (ts, src_id, mid) ends in the weighted
    * value itself, so duplicate fixture rows can't make the lead()
    * assignment order-dependent (see NOTES — lineitem src_ids are NOT
    * unique). One window pass + one aggregate, both partitioned by
    * symbol: a single shuffle at any scale.
    */
  private val q85 = Q("q85_twap_mid",
    (s, d) => {
      val quotes = AnalyticsQueries.booksDirect(s, d)
        .select(col("src_id"), col("symbol"), col("ts_exchange_ms").as("ts"),
          ((col("best_bid") + col("best_ask")) / lit(2.0d)).as("mid"))
      val w = Window.partitionBy("symbol").orderBy("ts", "src_id", "mid")
      quotes
        .withColumn("dwell", lead(col("ts"), 1).over(w) - col("ts"))
        .where(col("dwell").isNotNull)
        .groupBy("symbol")
        .agg(StableAgg.dsum(col("mid") * col("dwell").cast("double")).as("wsum"),
          sum(col("dwell")).as("tspan"),
          count(lit(1)).as("n_updates"))
        .select(col("symbol"), (col("wsum") / col("tspan").cast("double")).as("twap_mid"),
          col("tspan"), col("n_updates"))
        .orderBy("symbol")
    },
    Some(s"""WITH bk AS (
        SELECT (l_orderkey * 10 + l_linenumber) AS src_id,
          'SYM-' || CAST(l_partkey % 10 AS VARCHAR) AS symbol,
          epoch_ms(l_shipdate) AS ts,
          (l_extendedprice + (l_extendedprice + 1.0::DOUBLE)) / 2.0::DOUBLE AS mid
        FROM lineitem
        WHERE l_orderkey % 17 <> 0 AND l_orderkey % 11 <> 0 AND l_orderkey % 13 <> 0),
      led AS (
        SELECT symbol, mid,
          lead(ts, 1) OVER (PARTITION BY symbol ORDER BY ts, src_id, mid) - ts AS dwell
        FROM bk)
      SELECT symbol,
        ${O.dsum("mid * CAST(dwell AS DOUBLE)")} / CAST(CAST(SUM(dwell) AS BIGINT) AS DOUBLE) AS twap_mid,
        CAST(SUM(dwell) AS BIGINT) AS tspan,
        COUNT(*) AS n_updates
      FROM led WHERE dwell IS NOT NULL
      GROUP BY symbol ORDER BY symbol"""))

  /** Forward as-of join with a 7-day tolerance (q35's mirror image): for
    * each signup, the EARLIEST purchase at-or-after it by the same user,
    * nulled when more than 7 days ahead. The right side is pre-aggregated
    * to a unique (user_id, ts_ms) grid so the match is well-defined on
    * any engine. Oracle: DuckDB's native ASOF LEFT JOIN — a fully
    * independent implementation of the same semantics.
    */
  private val q86 = Q("q86_asof_forward",
    (s, d) => {
      val e = Tables.events(s, d)
      val l = e.where(col("event_type") === "signup")
        .select(col("user_id"), col("ts_ms"), col("value").as("signup_value"))
      val r = e.where(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts_ms"))
        .agg(max(col("value")).as("purchase_value"))
      graft.operators.AsOfJoin.firstValueAsOfForward(
          l, r, keys = Seq("user_id"), tsCol = "ts_ms",
          valueCols = Seq("purchase_value"), tieCol = "ts_ms",
          toleranceMs = Some(604800000L))
        .orderBy("user_id", "ts_ms", "signup_value")
    },
    Some("""WITH l AS (
        SELECT user_id, epoch_ms(ts) AS ts_ms, value AS signup_value
        FROM events WHERE event_type = 'signup'),
      r AS (
        SELECT user_id, epoch_ms(ts) AS ts_ms, MAX(value) AS purchase_value
        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
      SELECT l.user_id, l.ts_ms, l.signup_value,
        CASE WHEN r.ts_ms - l.ts_ms <= 604800000 THEN r.ts_ms END AS asof_ts_ms,
        CASE WHEN r.ts_ms - l.ts_ms <= 604800000 THEN r.purchase_value END AS asof_purchase_value
      FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts_ms <= r.ts_ms
      ORDER BY l.user_id, l.ts_ms, signup_value"""))

  /** Calendar gap-fill + forward fill (last observation carried forward)
    * over the daily close bars: every symbol gets a dense day range
    * (sequence + explode), missing days join as null and inherit the
    * previous close via `last(ignoreNulls)` — the standard
    * continuity-restoring operator for bar series. One co-partitioned
    * left join + one window pass, both keyed by symbol; the calendar
    * explode is O(days) per symbol with no shuffle of its own.
    */
  private val q87 = Q("q87_gap_fill_locf",
    (s, d) => {
      val bars = AnalyticsQueries.closeBars(s, d)
      val cal = bars.groupBy("symbol")
        .agg(min("day_bucket").as("lo"), max("day_bucket").as("hi"))
        .select(col("symbol"), explode(sequence(col("lo"), col("hi"))).as("day_bucket"))
      val w = Window.partitionBy("symbol").orderBy("day_bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
      cal.join(bars, Seq("symbol", "day_bucket"), "left")
        .withColumn("close_ff", last(col("close"), ignoreNulls = true).over(w))
        .withColumn("is_gap", col("close").isNull)
        .select("symbol", "day_bucket", "close_ff", "is_gap")
        .orderBy("symbol", "day_bucket")
    },
    Some(s"""WITH ${AnalyticsQueries.duckTrades}, ${AnalyticsQueries.duckCloseBars},
      cal AS (
        SELECT symbol, unnest(generate_series(min(day_bucket), max(day_bucket))) AS day_bucket
        FROM bars GROUP BY symbol),
      f AS (
        SELECT cal.symbol, cal.day_bucket, bars.close
        FROM cal LEFT JOIN bars USING (symbol, day_bucket))
      SELECT symbol, day_bucket,
        last_value(close IGNORE NULLS) OVER (PARTITION BY symbol ORDER BY day_bucket
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS close_ff,
        (close IS NULL) AS is_gap
      FROM f ORDER BY symbol, day_bucket"""))

  /** Sliding event-time windows — the reference's 5s-window/1s-slide
    * rolling metrics shape (reference/src/metrics/rolling.py:20-26,
    * window/slide = 1h/15min here at daily-data scale): each event lands
    * in length/slide windows via Spark's native `window()` slide
    * expansion; count + exact sum + min/max per window. The oracle
    * re-derives the window assignment arithmetically (slot - k for
    * k < length/slide), so Spark's epoch-aligned slide semantics are
    * what's being gated.
    */
  private val q88 = Q("q88_sliding_window_stats",
    (s, d) => {
      Tables.events(s, d)
        .groupBy(window(col("ts_utc"), "1 hour", "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), StableAgg.dsum(col("value")).as("sum_value"),
          min(col("value")).as("min_value"), max(col("value")).as("max_value"))
        .select(unix_millis(col("window.start")).as("ws"), col("event_type"),
          col("cnt"), col("sum_value"), col("min_value"), col("max_value"))
        .orderBy("ws", "event_type")
    },
    Some(s"""WITH x AS (
        SELECT unnest(generate_series(epoch_ms(ts) // 900000 - 3, epoch_ms(ts) // 900000))
            * 900000 AS ws,
          event_type, value
        FROM events)
      SELECT ws, event_type, COUNT(*) AS cnt,
        ${O.dsum("value")} AS sum_value,
        MIN(value) AS min_value, MAX(value) AS max_value
      FROM x GROUP BY ws, event_type
      ORDER BY ws, event_type"""))

  /** Correlated-subquery closure: EXISTS / NOT EXISTS predicates and a
    * correlated scalar COUNT subquery in both WHERE and SELECT — the
    * remaining subquery shapes q18's semi/anti joins (Dataset API) and
    * q118's LATERAL don't exercise through the SQL surface. Catalyst
    * decorrelates all four into joins (RewriteCorrelatedScalarSubquery /
    * RewritePredicateSubquery): the plan is a chain of aggregate + semi /
    * anti / left joins on o_custkey — no per-row re-execution, which is
    * what makes the construct survive 100 TB (each subquery becomes one
    * shuffled-or-broadcast join keyed on the correlation column).
    * Integer-only predicates and counts keep the gate float-free.
    */
  private val q143 = Q("q143_correlated_subqueries",
    (s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("q143_customer")
      Tables.orders(s, d).createOrReplaceTempView("q143_orders")
      s.sql("""SELECT c.c_custkey, c.c_name,
          (SELECT COUNT(*) FROM q143_orders o2
           WHERE o2.o_custkey = c.c_custkey) AS n_orders
        FROM q143_customer c
        WHERE EXISTS (SELECT 1 FROM q143_orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
          AND NOT EXISTS (SELECT 1 FROM q143_orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0D)
          AND (SELECT COUNT(*) FROM q143_orders o3
            WHERE o3.o_custkey = c.c_custkey
              AND o3.o_orderpriority = '1-URGENT') >= 2
        ORDER BY c_custkey""")
    },
    Some("""SELECT c.c_custkey, c.c_name,
        (SELECT COUNT(*) FROM orders o2
         WHERE o2.o_custkey = c.c_custkey) AS n_orders
      FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
        AND NOT EXISTS (SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0::DOUBLE)
        AND (SELECT COUNT(*) FROM orders o3
          WHERE o3.o_custkey = c.c_custkey
            AND o3.o_orderpriority = '1-URGENT') >= 2
      ORDER BY c_custkey"""))

  /** Date-spine generation + coverage report: `sequence()` over the
    * corpus date bounds exploded to one row per calendar day, left-joined
    * against daily order counts — the standard missing-data audit (q87's
    * LOCF gap-fill interpolates BETWEEN existing rows; this generates
    * rows that don't exist at all). Scale shape: the bounds aggregate is
    * a 1-row broadcast; the spine is O(days), trivially small next to the
    * fact table; the daily counts are one partial-aggregated shuffle, and
    * the spine join broadcasts the SMALL side (the counts keyed by day —
    * at most |days| rows regardless of fact-table size).
    */
  private val q145 = Q("q145_date_spine",
    (s, d) => {
      val o = Tables.orders(s, d).withColumn("day", to_date(col("o_orderdate")))
      val daily = o.filter(col("o_orderpriority") === "1-URGENT")
        .groupBy("day").agg(count(lit(1)).as("n_urgent"))
      val bounds = o.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      val spine = bounds.select(explode(sequence(col("d0"), col("d1"))).as("day"))
      spine.join(broadcast(daily), Seq("day"), "left")
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          coalesce(col("n_urgent"), lit(0L)).as("n_urgent"),
          col("n_urgent").isNull.as("is_gap"))
        .orderBy("day")
    },
    Some("""WITH o AS (SELECT CAST(o_orderdate AS DATE) AS day, o_orderpriority
          FROM orders),
        b AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM o),
        spine AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
          FROM b),
        daily AS (SELECT day, COUNT(*) AS n FROM o
          WHERE o_orderpriority = '1-URGENT' GROUP BY day)
      SELECT strftime(s.day, '%Y-%m-%d') AS day,
        CAST(coalesce(daily.n, 0) AS BIGINT) AS n_urgent,
        daily.n IS NULL AS is_gap
      FROM spine s LEFT JOIN daily USING (day)
      ORDER BY day"""))

  /** Realized volatility per event series: daily bars (deterministic
    * close via the unique (ts_ms, event_id) sequence key), then two
    * estimators — close-to-close volatility over ARITHMETIC returns
    * (sample std via exact decimal moments, the q82 device) and the
    * RMS relative intraday range ((high−low)/close). Both are libm-free
    * on purpose (see q42): returns and ranges are single IEEE divisions,
    * squares are exact ops, and every reduction rides the decimal route,
    * so the gate is bit-exact under any partitioning. A log-returns
    * variant would differ only by `ln`, which no cross-engine hash can
    * gate. One shuffle to bars, one window pass for lag, one 5-group
    * final aggregate.
    */
  private val q147 = Q("q147_realized_volatility",
    (s, d) => {
      val seqk = struct(col("ts_ms").as("t"), col("event_id").as("i"),
        col("value").as("p"))
      // Floor division (not `div`, which truncates toward zero) so the
      // day bucket matches DuckDB's `//` for negative epoch-ms too —
      // the gate must not depend on the fixture being all-positive.
      // pmod keeps it exact integer arithmetic (a double route would
      // lose ulps past 2^53).
      val daily = Tables.events(s, d)
        .withColumn("day",
          expr("(ts_ms - pmod(ts_ms, 86400000L)) div 86400000L"))
        .groupBy("event_type", "day")
        .agg(max(seqk).getField("p").as("close"),
          max(col("value")).as("high"), min(col("value")).as("low"))
      val w = Window.partitionBy("event_type").orderBy("day")
      val r = daily
        .withColumn("prev_close", lag(col("close"), 1).over(w))
        .withColumn("ret", (col("close") - col("prev_close")) / col("prev_close"))
        .withColumn("range_r", (col("high") - col("low")) / col("close"))
      r.groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
          count(col("ret")).as("n_rets"),
          StableAgg.dsum(col("ret"), 12).as("sx"),
          StableAgg.dsum(col("ret") * col("ret"), 12).as("sxx"),
          StableAgg.dsum(col("range_r") * col("range_r"), 12).as("srr"))
        .withColumn("nd", col("n_rets").cast("double"))
        .select(col("event_type"), col("n_days"), col("n_rets"),
          sqrt((col("sxx") - col("sx") * col("sx") / col("nd")) / (col("nd") - lit(1.0d)))
            .as("vol_cc"),
          sqrt(col("srr") / col("n_days").cast("double")).as("range_rms"))
        .orderBy("event_type")
    },
    Some(s"""WITH daily AS (
        SELECT event_type, epoch_ms(ts) // 86400000 AS day,
          arg_max(value, printf('%013d|%012d', epoch_ms(ts), event_id)) AS close,
          MAX(value) AS high, MIN(value) AS low
        FROM events GROUP BY event_type, day),
      r AS (SELECT event_type, close, high, low,
          (close - lag(close) OVER (PARTITION BY event_type ORDER BY day))
            / lag(close) OVER (PARTITION BY event_type ORDER BY day) AS ret,
          (high - low) / close AS range_r
        FROM daily),
      agg AS (SELECT event_type,
          CAST(COUNT(*) AS BIGINT) AS n_days,
          CAST(COUNT(ret) AS BIGINT) AS n_rets,
          ${O.dsum("ret", 12)} AS sx,
          ${O.dsum("ret * ret", 12)} AS sxx,
          ${O.dsum("range_r * range_r", 12)} AS srr
        FROM r GROUP BY event_type)
      SELECT event_type, n_days, n_rets,
        sqrt((sxx - sx * sx / CAST(n_rets AS DOUBLE))
          / (CAST(n_rets AS DOUBLE) - 1.0::DOUBLE)) AS vol_cc,
        sqrt(srr / CAST(n_days AS DOUBLE)) AS range_rms
      FROM agg ORDER BY event_type"""))

  /** XML extraction (`from_xml`, native in Spark 4 — the third
    * semi-structured leaf next to q18's JSON schema-parse and q259's
    * schemaless variant): each event is wrapped into an XML record with
    * an ATTRIBUTE (`id`, surfacing the `_`-prefix attribute mapping), a
    * repeated element (`<t>` → array<string>), and numeric leaf
    * elements; the parse must navigate all three shapes. Doubles
    * round-trip the XML text bit-exactly (shortest-round-trip render on
    * write, exact parse on read), so the decimal-route sum gates the
    * codec, not an approximation.
    *
    * Scale: same story as variant — parse is scan-local codegen'd work,
    * one pass, and the aggregate is the only exchange; feed XML at
    * 100 TB (SEC filings, PubMed, legacy B2B) and the plan is unchanged.
    */
  private val q262 = Q("q262_xml_extract",
    (s, d) => {
      import org.apache.spark.sql.types._
      val xml = concat(lit("<rec id=\""), col("event_id"), lit("\"><v>"),
        col("value"), lit("</v><k>"),
        expr("variant_get(parse_json(props), '$.k', 'bigint')"),
        lit("</k><tags><t>t0</t>"),
        when(pmod(col("event_id"), lit(3)) >= 1, lit("<t>t1</t>")).otherwise(lit("")),
        when(pmod(col("event_id"), lit(3)) === 2, lit("<t>t2</t>")).otherwise(lit("")),
        lit("</tags></rec>"))
      val schema = StructType(Seq(
        StructField("_id", LongType),
        StructField("v", DoubleType),
        StructField("k", LongType),
        StructField("tags", StructType(Seq(
          StructField("t", ArrayType(StringType)))))))
      Tables.fanOut(Tables.events(s, d))
        .select(col("event_type"), from_xml(xml, schema).as("x"))
        .select(col("event_type"), col("x._id").as("id"), col("x.v").as("v"),
          col("x.k").as("k"), size(col("x.tags.t")).as("n_tags"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("id")).as("id_sum"),
          sum(col("k")).as("k_sum"),
          StableAgg.dsum(col("v")).as("v_sum"),
          sum(col("n_tags")).as("tag_total"))
        .orderBy("event_type")
    },
    Some(s"""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(event_id) AS BIGINT) AS id_sum,
        CAST(SUM(CAST(props->>'$$.k' AS BIGINT)) AS BIGINT) AS k_sum,
        ${O.dsum("value")} AS v_sum,
        CAST(SUM(1 + (CASE WHEN event_id % 3 >= 1 THEN 1 ELSE 0 END)
          + (CASE WHEN event_id % 3 = 2 THEN 1 ELSE 0 END)) AS BIGINT)
          AS tag_total
      FROM events GROUP BY event_type ORDER BY event_type"""))

  private val q263Runs = new java.util.concurrent.atomic.AtomicInteger

  /** Parameterized SQL (`spark.sql(text, args)` named parameters + the
    * `IDENTIFIER(:param)` clause + lateral column aliases): the query
    * template names its table through an identifier parameter and its
    * thresholds through value parameters — the injection-safe template
    * mechanism a multi-tenant query service uses instead of string
    * interpolation — and the projection chains lateral aliases
    * (`doubled` referencing `halved` in the same SELECT). Values arrive
    * through the parameter binding, never the SQL text.
    *
    * Scale: parameter binding is a parse-time substitution — plans for
    * the same template are structurally identical across bindings, which
    * is what makes plan-cache hit rates work on a busy cluster.
    */
  private val q263 = Q("q263_parameterized_sql",
    (s, d) => {
      val view = s"q263_events_${ProcessHandle.current().pid()}_${q263Runs.incrementAndGet()}"
      Tables.fanOut(Tables.events(s, d)).createOrReplaceTempView(view)
      try {
        s.sql(
          """SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(CAST(value / 2 AS STRING) AS DECIMAL(38, 6))) AS DOUBLE)
                 AS half_sum,
               CAST(SUM(CASE WHEN doubled > :dblThr THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_big
             FROM (
               SELECT event_type, value, value / 2 AS halved,
                 halved * 4 AS doubled
               FROM IDENTIFIER(:tbl) WHERE value > :minVal AND user_id < :maxUser)
             GROUP BY event_type ORDER BY event_type""",
          Map("tbl" -> view, "minVal" -> 5.0d, "maxUser" -> 120L,
            "dblThr" -> 100.0d))
          .localCheckpoint(true)
      } finally s.catalog.dropTempView(view)
    },
    Some(s"""WITH f AS (SELECT event_type, value, value / 2 AS halved,
          (value / 2) * 4 AS doubled
        FROM events WHERE value > 5.0::DOUBLE AND user_id < 120)
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        ${O.dsum("value / 2")} AS half_sum,
        CAST(SUM(CASE WHEN doubled > 100.0::DOUBLE THEN 1 ELSE 0 END) AS BIGINT)
          AS n_big
      FROM f GROUP BY event_type ORDER BY event_type"""))

  private val q264Runs = new java.util.concurrent.atomic.AtomicInteger

  /** SQL scripting (Spark 4 compound statements: BEGIN/END, DECLARE
    * variables, WHILE, SET VAR) — the procedural control-flow surface
    * that lets an iterative algorithm live entirely in SQL: three
    * rounds of progressive mean-trimming (each round recomputes the
    * decimal-route mean of the rows above the previous threshold — the
    * iterative-threshold idiom of outlier trimming), then the final
    * SELECT reports per-family survivors against the converged
    * threshold. The oracle unrolls the three rounds as CTEs, so the
    * loop must execute exactly three times with exactly this
    * arithmetic.
    *
    * Scale: each loop iteration is one ordinary distributed aggregate;
    * the script only moves SCALARS (the threshold) between rounds —
    * the same driver-side-scalar/cluster-side-scan split as q126's BPE
    * loop, but expressed in the SQL-native control flow a warehouse
    * migration brings along.
    */
  private val q264 = Q("q264_sql_scripting",
    (s, d) => {
      val view = s"q264_events_${ProcessHandle.current().pid()}_${q264Runs.incrementAndGet()}"
      Tables.fanOut(Tables.events(s, d)).createOrReplaceTempView(view)
      // scripting enabled on a session CLONE (ConfScope; the clone copies
      // the parent's temp views, so `view` resolves); localCheckpoint
      // materializes the result eagerly inside the scope.
      try {
        ConfScope.withConfs(s, "spark.sql.scripting.enabled" -> "true") { c =>
        c.sql(
          s"""BEGIN
               DECLARE i INT DEFAULT 0;
               DECLARE thr DOUBLE DEFAULT 0.0;
               WHILE i < 3 DO
                 SET thr = (
                   SELECT CAST(SUM(CAST(CAST(value AS STRING) AS DECIMAL(38, 6)))
                       AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                   FROM $view WHERE value >= thr);
                 SET i = i + 1;
               END WHILE;
               SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_kept,
                 CAST(SUM(CAST(CAST(value AS STRING) AS DECIMAL(38, 6)))
                     AS DOUBLE) AS kept_sum,
                 MAX(thr) AS final_thr
               FROM $view WHERE value >= thr
               GROUP BY event_type ORDER BY event_type;
             END""").localCheckpoint(true)
        }
      } finally s.catalog.dropTempView(view)
    },
    Some(s"""WITH m0 AS (SELECT ${O.dsum("value")} / CAST(COUNT(*) AS DOUBLE)
          AS thr FROM events),
      m1 AS (SELECT ${O.dsum("value")} / CAST(COUNT(*) AS DOUBLE) AS thr
        FROM events, m0 WHERE value >= m0.thr),
      m2 AS (SELECT ${O.dsum("value")} / CAST(COUNT(*) AS DOUBLE) AS thr
        FROM events, m1 WHERE value >= m1.thr)
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_kept,
        ${O.dsum("value")} AS kept_sum,
        MAX(m2.thr) AS final_thr
      FROM events, m2 WHERE value >= m2.thr
      GROUP BY event_type ORDER BY event_type"""))

  /** MAP-type higher-order functions (`map_from_entries`,
    * `transform_values`, `map_filter`, `map_keys`, `element_at`) — the
    * map half of the HOF surface q144 covers for arrays: per user, the
    * event-type histogram is materialized AS A MAP, doubled via
    * `transform_values`, thresholded via `map_filter`, and read back by
    * key. Maps have no deterministic cross-engine ordering, so every
    * OUTPUT is scalarized (sizes, a keyed lookup, sorted-key join
    * string) — the rule for map columns at any engine boundary.
    *
    * Scale: the map never leaves the row it was built in — zero extra
    * shuffle over the (user, type) aggregate that feeds it; maps are a
    * projection-layer tool, not a storage layout.
    */
  private val q269 = Q("q269_map_functions",
    (s, d) => {
      Tables.fanOut(Tables.events(s, d))
        .groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("cnt"))
        .groupBy("user_id")
        .agg(map_from_entries(sort_array(
          collect_list(struct(col("event_type"), col("cnt"))))).as("m"))
        .select(col("user_id"),
          size(col("m")).as("n_types"),
          coalesce(element_at(col("m"), "click"), lit(0L)).as("n_clicks"),
          array_join(sort_array(map_keys(
            map_filter(transform_values(col("m"), (_, v) => v * 2),
              (_, v2) => v2 >= 4L))), ",").as("frequent_types"))
        .orderBy("user_id")
    },
    Some("""WITH c AS (SELECT user_id, event_type, COUNT(*) AS cnt
          FROM events GROUP BY 1, 2)
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_types,
        CAST(coalesce(SUM(CASE WHEN event_type = 'click' THEN cnt END), 0)
          AS BIGINT) AS n_clicks,
        coalesce(string_agg(CASE WHEN cnt * 2 >= 4 THEN event_type END, ','
          ORDER BY event_type), '') AS frequent_types
      FROM c GROUP BY user_id ORDER BY user_id"""))

  /** `grouping_id()` / `grouping()` over ROLLUP — the disambiguation
    * surface q60/q130's grouped sets need in practice: a rollup over
    * (event_type, user-parity) where some data values could collide
    * with the subtotal NULLs; `grouping()` tells a real NULL key from a
    * rollup placeholder and `grouping_id()` labels each aggregation
    * level, so downstream consumers can filter exactly the grand total
    * or exactly the leaf rows without guessing from NULLs.
    */
  private val q271 = Q("q271_grouping_id",
    (s, d) => {
      Tables.fanOut(Tables.events(s, d))
        .withColumn("parity",
          when(pmod(col("user_id"), lit(2)) === 0, lit("even")).otherwise(lit("odd")))
        .rollup("event_type", "parity")
        .agg(count(lit(1)).as("n"),
          grouping_id().as("gid"),
          grouping(col("event_type")).as("g_et"),
          grouping(col("parity")).as("g_par"))
        .orderBy(col("gid"), col("event_type"), col("parity"))
    },
    Some("""SELECT event_type,
        CASE WHEN GROUPING(parity) = 0 THEN parity END AS parity,
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(GROUPING(event_type) * 2 + GROUPING(parity) AS BIGINT) AS gid,
        CAST(GROUPING(event_type) AS TINYINT) AS g_et,
        CAST(GROUPING(parity) AS TINYINT) AS g_par
      FROM (SELECT event_type,
          CASE WHEN user_id % 2 = 0 THEN 'even' ELSE 'odd' END AS parity
        FROM events)
      GROUP BY ROLLUP (event_type, parity)
      ORDER BY gid, event_type, parity"""))

  /** Time-series resample + forward fill: the daily close of each event
    * family re-sampled onto a COMPLETE day spine (q145's sequence/
    * explode device), gaps carried forward with
    * `last_value(..., ignoreNulls = true)` — the standard
    * as-of-resample every market/telemetry pipeline runs, and the
    * window surface (IGNORE NULLS variants) the frame family hadn't
    * gated. Day-one gaps before the first observation stay NULL and
    * are counted, not invented.
    *
    * Scale: the spine is calendar-sized, the join is day-keyed, and
    * the ffill window is one pass per family ordered by day — no
    * self-join on time.
    */
  private val q272 = Q("q272_resample_ffill",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), expr("ts_ms div 86400000").as("day"))
        .agg(max(struct(col("ts_ms"), col("event_id"), col("value"))).as("last"))
        .select(col("event_type"), col("day"), col("last.value").as("close"))
      val bounds = daily.agg(min("day").as("d0"), max("day").as("d1"))
      val spine = bounds
        .select(explode(sequence(col("d0"), col("d1"))).as("day"))
        .crossJoin(daily.select("event_type").distinct())
      val w = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
      spine.join(daily, Seq("event_type", "day"), "left")
        .withColumn("filled_close",
          last(col("close"), ignoreNulls = true).over(w))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
          sum(when(col("close").isNull, 1L).otherwise(0L)).as("n_gaps"),
          sum(when(col("filled_close").isNull, 1L).otherwise(0L)).as("n_leading_null"),
          StableAgg.dsum(coalesce(col("filled_close"), lit(0.0d))).as("filled_sum"))
        .orderBy("event_type")
    },
    Some(s"""WITH daily AS (
        SELECT event_type, epoch_ms(ts) // 86400000 AS day,
          arg_max(value, printf('%013d|%012d', epoch_ms(ts), event_id)) AS close
        FROM events GROUP BY 1, 2),
      b AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
      spine AS (SELECT et.event_type, s.day
        FROM (SELECT DISTINCT event_type FROM daily) et,
          (SELECT unnest(generate_series((SELECT d0 FROM b),
            (SELECT d1 FROM b))) AS day) s),
      j AS (SELECT sp.event_type, sp.day, daily.close,
          last_value(daily.close IGNORE NULLS) OVER (
            PARTITION BY sp.event_type ORDER BY sp.day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_close
        FROM spine sp LEFT JOIN daily
          ON sp.event_type = daily.event_type AND sp.day = daily.day)
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
        CAST(SUM(CASE WHEN close IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_gaps,
        CAST(SUM(CASE WHEN filled_close IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_leading_null,
        ${O.dsum("coalesce(filled_close, 0.0)")} AS filled_sum
      FROM j GROUP BY event_type ORDER BY event_type"""))

  override val all: Seq[Q] = Seq(q80, q81, q82, q83, q84, q85, q86, q87, q88,
    q143, q145, q147, q262, q263, q264, q269, q271, q272)
}
