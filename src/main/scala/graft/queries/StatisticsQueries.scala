package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.StableAgg
import graft.{OracleSql => O, Tables}

/** Statistical-census operators (round 10): the time-series diagnostics,
  * distribution audits, and planning censuses an analytics platform runs
  * over its tapes and fact tables — variance-ratio and autocorrelation
  * tests, range-based volatility, Markov transition matrices, Benford
  * first-digit audits, Fellegi–Sunter record-linkage scoring, exact
  * equi-depth partition boundaries, weighted quantiles, and Gini
  * concentration. All deterministic under any partitioning: integer
  * arithmetic where possible, the StableAgg decimal route for double
  * sums, literal constants instead of libm calls (the q42/q147 stance),
  * and every window ordered by a tie-free key ((ts_ms, event_id) is
  * unique in `events`).
  */
object StatisticsQueries extends Registry {

  /** Shared DuckDB events relation (ms since epoch, tie-free order). */
  private val duckEvents =
    "e AS (SELECT event_id, epoch_ms(ts) AS ms, user_id, event_type, value FROM events)"

  /** Lo–MacKinlay variance ratio, arithmetic 1-step vs overlapping
    * 5-step differences of the per-type value series (VR ≈ 1 under a
    * random walk; <1 mean-reversion, >1 trending). Deliberately on
    * ARITHMETIC differences, not log returns — libm-free, and the 5-step
    * difference telescopes to v_t − v_{t−5} so both horizons come from
    * ONE lag window pass. Population variances from exact decimal sums
    * (the dstdSamp device), ratio as the final double division.
    *
    * Scale: one shuffle on event_type feeds the lag window AND the
    * |types|-row moment aggregate — a single pass over the tape; per-row
    * state is two lag slots.
    */
  private val q281 = Q("q281_variance_ratio",
    (s, d) => {
      val w = Window.partitionBy("event_type").orderBy("ts_ms", "event_id")
      val diffs = Tables.events(s, d)
        .select(col("event_type"), col("ts_ms"), col("event_id"), col("value"))
        .withColumn("d1", col("value") - lag(col("value"), 1).over(w))
        .withColumn("d5", col("value") - lag(col("value"), 5).over(w))
      def varPop(c: org.apache.spark.sql.Column, n: org.apache.spark.sql.Column) = {
        val s1 = StableAgg.dsum(c)
        val s2 = StableAgg.dsum(c * c, 10)
        s2 / n - (s1 / n) * (s1 / n)
      }
      diffs.groupBy("event_type")
        .agg(count(col("d1")).as("n_d1"), count(col("d5")).as("n_d5"),
          (varPop(col("d5"), count(col("d5")))
            / (lit(5.0) * varPop(col("d1"), count(col("d1"))))).as("vr5"))
        .orderBy("event_type")
    },
    Some(s"""WITH $duckEvents,
      dd AS (SELECT event_type,
          value - lag(value, 1) OVER w AS d1,
          value - lag(value, 5) OVER w AS d5
        FROM e WINDOW w AS (PARTITION BY event_type ORDER BY ms, event_id))
      SELECT event_type,
        CAST(COUNT(d1) AS BIGINT) AS n_d1, CAST(COUNT(d5) AS BIGINT) AS n_d5,
        ((${O.dsum("d5 * d5", 10)} / COUNT(d5)
            - (${O.dsum("d5")} / COUNT(d5)) * (${O.dsum("d5")} / COUNT(d5)))
          / (5.0::DOUBLE * (${O.dsum("d1 * d1", 10)} / COUNT(d1)
            - (${O.dsum("d1")} / COUNT(d1)) * (${O.dsum("d1")} / COUNT(d1))))) AS vr5
      FROM dd GROUP BY event_type ORDER BY event_type"""))

  /** Hourly OHLC bars per event type, then the range-based volatility
    * proxies built from them: Parkinson's squared relative range
    * ((H−L)/O)² and a Garman–Klass-shaped combination
    * 0.5·((H−L)/O)² − (2ln2−1)·((C−O)/O)² with ARITHMETIC returns in
    * place of log returns (2ln2−1 is a compile-time literal, not a libm
    * call — the engine's libm-free determinism stance; value > 0 in this
    * tape so the divisions are total). Open/close ride the packed-key
    * struct min/max device (q66): one aggregation pass, one struct of
    * state per bar, no window sort.
    *
    * Scale: shuffle to |types × hours| bars, then a |types|-row decimal
    * mean — the q66 profile with an estimator stage on top.
    */
  private val q282 = Q("q282_range_volatility",
    (s, d) => {
      // tie-free packed order key within an hour bucket: ms-within-hour
      // (< 2^22) shifted past event_id (< 2^36 at any harness SF)
      val key = (col("ts_ms") % 3600000L) * 68719476736L + col("event_id")
      val bars = Tables.events(s, d)
        .withColumn("hour_bucket", expr("ts_ms div 3600000"))
        .groupBy("event_type", "hour_bucket")
        .agg(min(struct(key.as("k"), col("value").as("v"))).getField("v").as("open"),
          max(col("value")).as("high"), min(col("value")).as("low"),
          max(struct(key.as("k"), col("value").as("v"))).getField("v").as("close"),
          count(lit(1)).as("n_events"))
      val rr = (col("high") - col("low")) / col("open")
      val cr = (col("close") - col("open")) / col("open")
      bars
        .withColumn("park", rr * rr)
        .withColumn("gkp", lit(0.5) * rr * rr - lit(0.3862943611198906) * cr * cr)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_bars"),
          StableAgg.davg(col("park"), 12).as("parkinson"),
          StableAgg.davg(col("gkp"), 12).as("garman_klass"))
        .orderBy("event_type")
    },
    Some(s"""WITH $duckEvents,
      b AS (SELECT event_type, ms // 3600000 AS hour_bucket,
          arg_min(value, (ms % 3600000) * 68719476736 + event_id) AS open,
          MAX(value) AS high, MIN(value) AS low,
          arg_max(value, (ms % 3600000) * 68719476736 + event_id) AS close
        FROM e GROUP BY 1, 2),
      est AS (SELECT event_type,
          ((high - low) / open) * ((high - low) / open) AS park,
          0.5::DOUBLE * ((high - low) / open) * ((high - low) / open)
            - 0.3862943611198906::DOUBLE * ((close - open) / open) * ((close - open) / open) AS gkp
        FROM b)
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_bars,
        ${O.davg("park", 12)} AS parkinson,
        ${O.davg("gkp", 12)} AS garman_klass
      FROM est GROUP BY event_type ORDER BY event_type"""))

  /** Uncentered autocorrelation of the 1-step value differences at lags
    * 1..3 per event type (the ACF panel behind a Ljung–Box-style serial-
    * correlation audit): r_ℓ = Σ d_t·d_{t−ℓ} / Σ d_t², each sum exact
    * via the decimal route, one division per lag at the end. Uncentered
    * (no mean subtraction) keeps each r a ratio of two exact sums —
    * fully order-free — and the tape's differences are near-zero-mean by
    * construction.
    *
    * Scale: one event_type shuffle feeds a 4-slot lag window and the
    * |types|-row aggregate; single pass, like q281.
    */
  private val q283 = Q("q283_acf_panel",
    (s, d) => {
      val w = Window.partitionBy("event_type").orderBy("ts_ms", "event_id")
      val diffs = Tables.events(s, d)
        .select(col("event_type"), col("ts_ms"), col("event_id"), col("value"))
        .withColumn("d", col("value") - lag(col("value"), 1).over(w))
        .withColumn("dl1", lag(col("d"), 1).over(w))
        .withColumn("dl2", lag(col("d"), 2).over(w))
        .withColumn("dl3", lag(col("d"), 3).over(w))
      diffs.groupBy("event_type")
        .agg(count(col("d")).as("n_diffs"),
          (StableAgg.dsum(col("d") * col("dl1"), 10)
            / StableAgg.dsum(col("d") * col("d"), 10)).as("acf1"),
          (StableAgg.dsum(col("d") * col("dl2"), 10)
            / StableAgg.dsum(col("d") * col("d"), 10)).as("acf2"),
          (StableAgg.dsum(col("d") * col("dl3"), 10)
            / StableAgg.dsum(col("d") * col("d"), 10)).as("acf3"))
        .orderBy("event_type")
    },
    Some(s"""WITH $duckEvents,
      d1 AS (SELECT event_type, ms, event_id,
          value - lag(value, 1) OVER w AS d
        FROM e WINDOW w AS (PARTITION BY event_type ORDER BY ms, event_id)),
      dd AS (SELECT event_type, d,
          lag(d, 1) OVER w AS dl1, lag(d, 2) OVER w AS dl2, lag(d, 3) OVER w AS dl3
        FROM d1 WINDOW w AS (PARTITION BY event_type ORDER BY ms, event_id))
      SELECT event_type, CAST(COUNT(d) AS BIGINT) AS n_diffs,
        ${O.dsum("d * dl1", 10)} / ${O.dsum("d * d", 10)} AS acf1,
        ${O.dsum("d * dl2", 10)} / ${O.dsum("d * d", 10)} AS acf2,
        ${O.dsum("d * dl3", 10)} / ${O.dsum("d * d", 10)} AS acf3
      FROM dd GROUP BY event_type ORDER BY event_type"""))

  /** Token association mining: the top co-occurring token pairs by LIFT
    * — (n_pair·N)/(n_a·n_b), the PMI ranking in linear domain (exact
    * integer products, ONE double division; no log) — over the document
    * corpus. Support floors on both tokens (df·25 ≥ N) and the pair
    * (support·125 ≥ N) are RELATIVE to corpus size, so the query's
    * selectivity is scale-invariant. Top-50 by (lift, pair) with a full
    * deterministic tiebreak.
    *
    * Scale: the corpus is tokenized ONCE; the per-doc self-join runs on
    * the SUPPORT-FILTERED token set — the standard frequent-pair
    * prefilter that caps the quadratic blowup (a doc contributes
    * O(k_frequent²) pairs, not O(k²)); pair counting is one shuffle on
    * (a, b). The |frequent-tokens| relation is broadcast back onto the
    * token stream twice (it is vocabulary-sized).
    */
  private val q284 = Q("q284_token_lift_pairs",
    (s, d) => {
      import graft.operators.TextAnalysis
      val docs = Tables.documents(s, d)
      val toks = docs.select(col("doc_id"),
          explode(TextAnalysis.tokens(col("text"))).as("tok"))
        .distinct()
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val dfreq = toks.groupBy("tok").agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(n))
        .filter(col("df") * 25 >= col("n_docs"))
        .select("tok", "df")
      val ft = toks.join(broadcast(dfreq), "tok")
      val pairs = ft.as("x").join(ft.as("y"),
          col("x.doc_id") === col("y.doc_id") && col("x.tok") < col("y.tok"))
        .select(col("x.tok").as("tok_a"), col("x.df").as("df_a"),
          col("y.tok").as("tok_b"), col("y.df").as("df_b"))
        .groupBy("tok_a", "df_a", "tok_b", "df_b")
        .agg(count(lit(1)).as("support"))
      val ranked = pairs.crossJoin(broadcast(n))
        .filter(col("support") * 125 >= col("n_docs"))
        .withColumn("lift", (col("support") * col("n_docs")).cast("double")
          / (col("df_a") * col("df_b")).cast("double"))
        .withColumn("rank", row_number().over(Window.orderBy(
          desc("lift"), asc("tok_a"), asc("tok_b"))).cast("int"))
        .filter(col("rank") <= 50)
      ranked.select("rank", "tok_a", "tok_b", "support", "lift")
        .orderBy("rank")
    },
    Some("""WITH toks AS (
        SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents),
      n AS (SELECT COUNT(*) AS n_docs FROM documents),
      dfreq AS (SELECT tok, COUNT(*) AS df FROM toks GROUP BY tok),
      keep AS (SELECT tok, df FROM dfreq CROSS JOIN n WHERE df * 25 >= n_docs),
      ft AS (SELECT t.doc_id, t.tok, k.df FROM toks t JOIN keep k USING (tok)),
      pairs AS (SELECT x.tok AS tok_a, x.df AS df_a, y.tok AS tok_b, y.df AS df_b,
          COUNT(*) AS support
        FROM ft x JOIN ft y ON x.doc_id = y.doc_id AND x.tok < y.tok
        GROUP BY 1, 2, 3, 4),
      ranked AS (SELECT tok_a, tok_b, support,
          CAST(support * n_docs AS DOUBLE) / CAST(df_a * df_b AS DOUBLE) AS lift
        FROM pairs CROSS JOIN n WHERE support * 125 >= n_docs),
      r AS (SELECT *, CAST(row_number() OVER (
          ORDER BY lift DESC, tok_a, tok_b) AS INTEGER) AS rank FROM ranked)
      SELECT rank, tok_a, tok_b, CAST(support AS BIGINT) AS support, lift
      FROM r WHERE rank <= 50 ORDER BY rank"""))

  /** First-order Markov transition matrix of per-user event-type
    * sequences (the session-flow model behind next-action prediction and
    * anomaly scoring): bigram counts over each user's time-ordered
    * stream, row-normalized to transition probabilities — exact longs
    * until the single final division. Dangling last-events simply emit
    * no transition.
    *
    * Scale: one user_id shuffle for the lead window, then a |types²|-row
    * aggregate (the matrix is vocabulary-sized); the row totals come
    * from a window over the aggregated matrix, not a second pass over
    * the tape.
    */
  private val q285 = Q("q285_markov_transitions",
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
      val trans = Tables.events(s, d)
        .select(col("user_id"), col("ts_ms"), col("event_id"),
          col("event_type").as("from_type"))
        .withColumn("to_type", lead(col("from_type"), 1).over(w))
        .filter(col("to_type").isNotNull)
        .groupBy("from_type", "to_type")
        .agg(count(lit(1)).as("n_trans"))
      trans
        .withColumn("row_total",
          sum(col("n_trans")).over(Window.partitionBy("from_type")))
        .withColumn("p", col("n_trans").cast("double") / col("row_total").cast("double"))
        .select("from_type", "to_type", "n_trans", "p")
        .orderBy("from_type", "to_type")
    },
    Some(s"""WITH $duckEvents,
      t AS (SELECT event_type AS from_type,
          lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS to_type
        FROM e),
      m AS (SELECT from_type, to_type, COUNT(*) AS n_trans
        FROM t WHERE to_type IS NOT NULL GROUP BY 1, 2)
      SELECT from_type, to_type, CAST(n_trans AS BIGINT) AS n_trans,
        CAST(n_trans AS DOUBLE) /
          CAST(SUM(n_trans) OVER (PARTITION BY from_type) AS DOUBLE) AS p
      FROM m ORDER BY from_type, to_type"""))

  /** Benford first-significant-digit audit of order totals — the classic
    * fabricated-data / pipeline-corruption screen. The digit comes from
    * the SHORTEST-ROUND-TRIP string render (both engines print doubles
    * as the same shortest digits for |x| inside plain-format range, and
    * the first [1-9] of that render IS the first significant digit —
    * no log10 / libm anywhere); expected Benford masses are literals and
    * the χ² contribution is per-digit row output (no 9-term double
    * reduction whose order could differ across engines).
    *
    * Scale: scan-local digit extraction + a 9-group aggregate; the
    * window total is over the 9-row result, not the fact table.
    */
  private val q286 = Q("q286_benford_census",
    (s, d) => {
      // double literals via the typed when-chain — a SQL-text CASE would
      // parse 0.30103 as DECIMAL(6,5) and silently switch the χ² column
      // to decimal arithmetic (caught by the oracle dtype compare)
      val benford = Seq(1 -> 0.30103, 2 -> 0.17609, 3 -> 0.12494,
          4 -> 0.09691, 5 -> 0.07918, 6 -> 0.06695, 7 -> 0.05799,
          8 -> 0.05115)
        .foldLeft[org.apache.spark.sql.Column](lit(0.04576)) {
          case (acc, (dig, p)) => when(col("digit") === dig, lit(p)).otherwise(acc)
        }
      Tables.orders(s, d)
        .select(regexp_extract(col("o_totalprice").cast("string"), "[1-9]", 0)
          .cast("int").as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n_obs"))
        .withColumn("total", sum(col("n_obs")).over(Window.partitionBy()))
        .withColumn("expected_p", benford)
        .withColumn("chi2_term",
          (col("n_obs") - col("expected_p") * col("total"))
            * (col("n_obs") - col("expected_p") * col("total"))
            / (col("expected_p") * col("total")))
        .select("digit", "n_obs", "expected_p", "chi2_term")
        .orderBy("digit")
    },
    Some("""WITH dg AS (SELECT CAST(regexp_extract(CAST(o_totalprice AS VARCHAR),
          '[1-9]', 0) AS INTEGER) AS digit FROM orders),
      c AS (SELECT digit, COUNT(*) AS n_obs FROM dg GROUP BY digit),
      t AS (SELECT *, SUM(n_obs) OVER () AS total,
          CAST(CASE digit WHEN 1 THEN 0.30103 WHEN 2 THEN 0.17609
            WHEN 3 THEN 0.12494 WHEN 4 THEN 0.09691 WHEN 5 THEN 0.07918
            WHEN 6 THEN 0.06695 WHEN 7 THEN 0.05799 WHEN 8 THEN 0.05115
            ELSE 0.04576 END AS DOUBLE) AS expected_p
        FROM c)
      SELECT digit, CAST(n_obs AS BIGINT) AS n_obs, expected_p,
        (n_obs - expected_p * total) * (n_obs - expected_p * total)
          / (expected_p * total) AS chi2_term
      FROM t ORDER BY digit"""))

  /** Fellegi–Sunter record-linkage scoring on blocked candidate pairs —
    * the probabilistic-matching stage that sits ON TOP of q180's ER
    * blocking: customer×supplier candidates blocked on nation, each
    * agreement feature contributing a fixed log-odds-shaped literal
    * weight (agree adds, disagree subtracts — weights are LITERALS, the
    * m/u probabilities having been estimated offline, so scoring is pure
    * deterministic double addition in one fixed expression). Pairs above
    * the decision threshold emerge ordered.
    *
    * Scale: the block join keys on nation (never a cross join); features
    * are scan-local per candidate pair; at 100 TB the supplier side of a
    * block broadcast-joins. Output is threshold-filtered, not all pairs.
    */
  private val q287 = Q("q287_linkage_fs_score",
    (s, d) => {
      val c = Tables.customer(s, d).select(col("c_custkey"),
        col("c_nationkey"), col("c_acctbal"))
      val sup = Tables.supplier(s, d).select(col("s_suppkey"),
        col("s_nationkey"), col("s_acctbal"))
      val score =
        when(abs(col("c_acctbal") - col("s_acctbal")) < 500.0, lit(2.2)).otherwise(lit(-0.8)) +
        when(col("c_custkey") % 10 === col("s_suppkey") % 10, lit(1.6)).otherwise(lit(-0.5)) +
        when(col("c_acctbal") > 0.0 && col("s_acctbal") > 0.0, lit(0.3)).otherwise(lit(-0.1))
      c.join(broadcast(sup), col("c_nationkey") === col("s_nationkey"))
        .withColumn("fs_score", score)
        .filter(col("fs_score") >= 2.0)
        .select("c_custkey", "s_suppkey", "fs_score")
        .orderBy("c_custkey", "s_suppkey")
    },
    Some("""WITH sc AS (SELECT c_custkey, s_suppkey,
        (CASE WHEN abs(c_acctbal - s_acctbal) < 500.0 THEN 2.2::DOUBLE ELSE -0.8::DOUBLE END
         + CASE WHEN c_custkey % 10 = s_suppkey % 10 THEN 1.6::DOUBLE ELSE -0.5::DOUBLE END
         + CASE WHEN c_acctbal > 0.0 AND s_acctbal > 0.0 THEN 0.3::DOUBLE ELSE -0.1::DOUBLE END) AS fs_score
      FROM customer JOIN supplier ON c_nationkey = s_nationkey)
      SELECT c_custkey, s_suppkey, fs_score FROM sc
      WHERE fs_score >= 2.0
      ORDER BY c_custkey, s_suppkey"""))

  /** Exact equi-depth partition boundaries: ntile(32) over the full
    * (price, tie-free key) order, then each bucket's row count and
    * [min, max] price — exactly the boundary table Spark's
    * RangePartitioner APPROXIMATES by reservoir sampling before a range
    * exchange or a sort-merge. The exact census is the skew audit: equal
    * counts by construction, boundary spreads expose value clustering.
    *
    * Scale: one total sort (the same cost any range-partitioned write
    * pays); at 100 TB this runs as the sampled approximation and this
    * query IS the fidelity check run on one partition-sized slice.
    */
  private val q288 = Q("q288_equi_depth_bounds",
    (s, d) => {
      val w = Window.orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
      Tables.lineitem(s, d)
        .select(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
        .withColumn("bucket", ntile(32).over(w).cast("int"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_rows"),
          min(col("l_extendedprice")).as("lo_price"),
          max(col("l_extendedprice")).as("hi_price"))
        .orderBy("bucket")
    },
    Some("""WITH b AS (SELECT l_extendedprice,
          CAST(ntile(32) OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber)
            AS INTEGER) AS bucket
        FROM lineitem)
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
        MIN(l_extendedprice) AS lo_price, MAX(l_extendedprice) AS hi_price
      FROM b GROUP BY bucket ORDER BY bucket"""))

  /** Weighted median (quantity-weighted l_extendedprice per return
    * flag): the first price, in tie-free ascending order, whose RUNNING
    * weight reaches half the group's total weight. Both the running and
    * total weights ride the exact decimal route, so the crossing index —
    * and therefore the answer — is identical on any partitioning or
    * engine (a double cumsum would make the ≥ comparison at the crossing
    * row round-off-dependent).
    *
    * Scale: one shuffle on the flag feeds the cumulative window and the
    * total; the crossing filter + MIN is a |groups|-row reduction. At
    * 100 TB the same shape computes any weighted quantile vector.
    */
  private val q289 = Q("q289_weighted_median",
    (s, d) => {
      val ord = Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val li = Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_extendedprice"),
          col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .withColumn("cum_w", StableAgg.dsumOver(col("l_quantity"), ord))
      val tot = li.groupBy("l_returnflag")
        .agg(StableAgg.dsum(col("l_quantity")).as("total_w"))
      li.join(tot, "l_returnflag")
        .filter(col("cum_w") >= col("total_w") * 0.5)
        .groupBy("l_returnflag")
        .agg(min(col("l_extendedprice")).as("w_median"),
          min(col("total_w")).as("total_w"))
        .orderBy("l_returnflag")
    },
    Some(s"""WITH c AS (SELECT l_returnflag, l_extendedprice,
          ${O.dsumOver("l_quantity",
            "(PARTITION BY l_returnflag ORDER BY l_extendedprice, l_orderkey, l_linenumber ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")} AS cum_w
        FROM lineitem),
      t AS (SELECT l_returnflag, ${O.dsum("l_quantity")} AS total_w
        FROM lineitem GROUP BY 1)
      SELECT l_returnflag, MIN(l_extendedprice) AS w_median, MIN(total_w) AS total_w
      FROM c JOIN t USING (l_returnflag)
      WHERE cum_w >= total_w * 0.5
      GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Gini concentration of order value per priority class (the
    * inequality census behind domain-mixture and sampling-cap decisions,
    * applied to the order book): the rank-covariance closed form
    * G = (2·Σ i·xᵢ − (n+1)·Σ xᵢ) / (n·Σ xᵢ) over values sorted
    * ascending with a tie-free rank. Both Σ terms ride the decimal
    * route; ranks are exact integers; the formula is three double ops at
    * the end.
    *
    * Scale: one shuffle on the priority key feeds the rank window and
    * the moment aggregate — the q281 profile on a fact table.
    */
  private val q290 = Q("q290_gini_concentration",
    (s, d) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice", "o_orderkey")
      val ranked = Tables.orders(s, d)
        .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
        .withColumn("rn", row_number().over(w).cast("long"))
      ranked.groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          ((lit(2.0) * StableAgg.dsum(col("rn") * col("o_totalprice"))
              - (count(lit(1)) + lit(1)).cast("double") * StableAgg.dsum(col("o_totalprice")))
            / (count(lit(1)).cast("double") * StableAgg.dsum(col("o_totalprice"))))
            .as("gini"))
        .orderBy("o_orderpriority")
    },
    Some(s"""WITH r AS (SELECT o_orderpriority, o_totalprice,
          CAST(row_number() OVER (PARTITION BY o_orderpriority
            ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS rn
        FROM orders)
      SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
        ((2.0::DOUBLE * ${O.dsum("rn * o_totalprice")}
            - CAST(COUNT(*) + 1 AS DOUBLE) * ${O.dsum("o_totalprice")})
          / (CAST(COUNT(*) AS DOUBLE) * ${O.dsum("o_totalprice")})) AS gini
      FROM r GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  override val all: Seq[Q] =
    Seq(q281, q282, q283, q284, q285, q286, q287, q288, q289, q290)
}
