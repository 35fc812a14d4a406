package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Evaluation & reliability operators (round 10): the model-evaluation
  * and operational-planning queries a training-data platform runs after
  * the data is curated — exact ROC-AUC, survival (Kaplan–Meier) risk
  * tables, per-column profiling censuses, compaction planning,
  * leakage-safe target encoding, and seasonal forecast-quality scoring.
  * Same determinism discipline as the rest of the registry: integer
  * arithmetic until the final division, midranks instead of float
  * cumulants, tie-free window orders, StableAgg decimal sums for double
  * accumulations.
  */
object EvaluationQueries extends Registry {

  /** Exact ROC-AUC via the Mann–Whitney rank-sum identity:
    * AUC = (Σ midrank(positives) − nP(nP+1)/2) / (nP·nN), where the
    * midrank of a tied score group is min-rank + (ties−1)/2 — the exact
    * tie-corrected estimator, not a trapezoid approximation. Label =
    * (event_type = 'purchase'), score = value. Midranks are rationals
    * with denominator 2, so 2·Σmidrank is an exact integer and AUC is
    * ONE double division at the end — bit-identical on any engine or
    * partitioning.
    *
    * Scale: rank() needs a global score order — ONE range-partitioned
    * sort (the same cost as any global ranking); ties resolved by a
    * per-score count broadcast-joined... no: both windows share the one
    * sort. Output is a single row. At 100 TB the same identity runs on
    * a per-score histogram (score cardinality ≪ rows) — the q184
    * bounded-domain device; this is the row-level exact form.
    */
  private val q291 = Q("q291_exact_auc",
    (s, d) => {
      val byScore = Window.orderBy("value")
      val perScore = Window.partitionBy("value")
      val ranked = Tables.events(s, d)
        .select(col("value"),
          (col("event_type") === "purchase").cast("int").as("label"))
        .withColumn("minrank", rank().over(byScore).cast("long"))
        .withColumn("ties", count(lit(1)).over(perScore))
      // 2·midrank = 2·minrank + ties − 1 (exact integers)
      ranked.agg(
          sum(col("label")).as("n_pos"),
          sum(lit(1) - col("label")).as("n_neg"),
          sum(when(col("label") === 1,
            lit(2L) * col("minrank") + col("ties") - 1L).otherwise(0L))
            .as("two_rank_sum"))
        .select(col("n_pos"), col("n_neg"),
          ((col("two_rank_sum") - col("n_pos") * (col("n_pos") + 1L)).cast("double")
            / (lit(2.0) * (col("n_pos") * col("n_neg")).cast("double"))).as("auc"))
    },
    Some("""WITH r AS (SELECT value,
          CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label,
          CAST(rank() OVER (ORDER BY value) AS BIGINT) AS minrank,
          COUNT(*) OVER (PARTITION BY value) AS ties
        FROM events)
      SELECT CAST(SUM(label) AS BIGINT) AS n_pos,
        CAST(SUM(1 - label) AS BIGINT) AS n_neg,
        CAST(SUM(CASE WHEN label = 1 THEN 2 * minrank + ties - 1 ELSE 0 END)
              - SUM(label) * (SUM(label) + 1) AS DOUBLE)
          / (2.0::DOUBLE * CAST(SUM(label) * SUM(1 - label) AS DOUBLE)) AS auc
      FROM r"""))

  /** Kaplan–Meier risk table over per-user activity lifetimes: duration
    * = last−first event (hours, floored to integers), right-censored if
    * the user was still active in the final 12 h of the tape. One row
    * per distinct EVENT time (durations with ≥1 death): n_at_risk (all
    * subjects with duration ≥ t), deaths, censored-at-t, and the exact
    * hazard d/n as one division. These are the estimator's sufficient
    * statistics; the survival curve Π(1−dᵢ/nᵢ) is a cumulative FLOAT
    * product whose cross-engine bit-identity no SQL engine guarantees,
    * so the gate pins the risk table and the certificate folds the
    * product in Scala.
    *
    * Scale: one user_id aggregation (the tape shuffle), then all
    * windows over the |durations|-row table — bounded by distinct
    * lifetimes, not events.
    */
  private val q292 = Q("q292_kaplan_meier",
    (s, d) => {
      val ev = Tables.events(s, d)
      val horizon = ev.agg(max(col("ts_ms")).as("max_ms"))
      val subj = ev.groupBy("user_id")
        .agg(min(col("ts_ms")).as("first_ms"), max(col("ts_ms")).as("last_ms"))
        .crossJoin(broadcast(horizon))
        .select(
          expr("(last_ms - first_ms) div 3600000").as("dur_h"),
          (col("last_ms") >= col("max_ms") - 43200000L).cast("int").as("censored"))
      val byTime = subj.groupBy("dur_h")
        .agg(sum(lit(1) - col("censored")).as("deaths"),
          sum(col("censored")).as("censored_n"),
          count(lit(1)).as("ending"))
      val atRisk = Window.orderBy("dur_h")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      byTime
        .withColumn("n_risk", sum(col("ending")).over(atRisk))
        .filter(col("deaths") > 0)
        .select(col("dur_h"), col("n_risk"), col("deaths"), col("censored_n"),
          (col("deaths").cast("double") / col("n_risk").cast("double")).as("hazard"))
        .orderBy("dur_h")
    },
    Some(s"""WITH e AS (SELECT user_id, epoch_ms(ts) AS ms FROM events),
      h AS (SELECT MAX(ms) AS max_ms FROM e),
      subj AS (SELECT
          CAST((MAX(ms) - MIN(ms)) // 3600000 AS BIGINT) AS dur_h,
          CASE WHEN MAX(ms) >= (SELECT max_ms FROM h) - 43200000 THEN 1 ELSE 0 END AS censored
        FROM e GROUP BY user_id),
      t AS (SELECT dur_h, SUM(1 - censored) AS deaths, SUM(censored) AS censored_n,
          COUNT(*) AS ending
        FROM subj GROUP BY dur_h),
      r AS (SELECT *, SUM(ending) OVER (ORDER BY dur_h
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n_risk FROM t)
      SELECT dur_h, CAST(n_risk AS BIGINT) AS n_risk,
        CAST(deaths AS BIGINT) AS deaths, CAST(censored_n AS BIGINT) AS censored_n,
        CAST(deaths AS DOUBLE) / CAST(n_risk AS DOUBLE) AS hazard
      FROM r WHERE deaths > 0 ORDER BY dur_h"""))

  /** Per-column profiling census of `orders` (the dbt/Deequ-style table
    * profile that gates ingest): one output row per column with null
    * count, exact distinct count, and min/max rendered to strings. All
    * per-column aggregates computed in ONE aggregation pass and
    * unpivoted from a single row — the multi-count(distinct) Expand is
    * the exact path (|cols|× the scan internally, still one shuffle of
    * partial aggregates); the 100 TB profile swaps exact distincts for
    * q156's HLL sketches, same dataflow.
    */
  private val q293 = Q("q293_profile_census",
    (s, d) => {
      val o = Tables.orders(s, d)
      def prof(c: String) = struct(
        sum(col(c).isNull.cast("long")).as("nulls"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).cast("string").as("min_s"),
        max(col(c)).cast("string").as("max_s"))
      val one = o.agg(
        prof("o_orderkey").as("c1"), prof("o_custkey").as("c2"),
        prof("o_orderstatus").as("c3"), prof("o_totalprice").as("c4"),
        prof("o_orderpriority").as("c5"))
      one.select(explode(map(
          lit("o_orderkey"), col("c1"), lit("o_custkey"), col("c2"),
          lit("o_orderstatus"), col("c3"), lit("o_totalprice"), col("c4"),
          lit("o_orderpriority"), col("c5"))).as(Seq("col_name", "p")))
        .select(col("col_name"), col("p.nulls").as("nulls"),
          col("p.n_distinct").as("n_distinct"), col("p.min_s"), col("p.max_s"))
        .orderBy("col_name")
    },
    Some("""SELECT 'o_custkey' AS col_name,
        CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls,
        CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
        CAST(MIN(o_custkey) AS VARCHAR) AS min_s, CAST(MAX(o_custkey) AS VARCHAR) AS max_s
      FROM orders
      UNION ALL SELECT 'o_orderkey',
        CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        CAST(COUNT(DISTINCT o_orderkey) AS BIGINT),
        CAST(MIN(o_orderkey) AS VARCHAR), CAST(MAX(o_orderkey) AS VARCHAR)
      FROM orders
      UNION ALL SELECT 'o_orderpriority',
        CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
        CAST(MIN(o_orderpriority) AS VARCHAR), CAST(MAX(o_orderpriority) AS VARCHAR)
      FROM orders
      UNION ALL SELECT 'o_orderstatus',
        CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
        CAST(MIN(o_orderstatus) AS VARCHAR), CAST(MAX(o_orderstatus) AS VARCHAR)
      FROM orders
      UNION ALL SELECT 'o_totalprice',
        CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
        CAST(MIN(o_totalprice) AS VARCHAR), CAST(MAX(o_totalprice) AS VARCHAR)
      FROM orders
      ORDER BY col_name"""))

  /** Compaction plan by sorted cumulative fill: a lakehouse table's file
    * inventory (synthesized metadata-plane: one "file" per
    * (order-month, priority) with bytes ∝ rows) is laid out in
    * (bytes DESC, key) order and chunked at a 128 KB target by
    * bin = floor(running_bytes_before / target) — the deterministic
    * planner real compactors (Iceberg binpack, Delta OPTIMIZE) run on
    * metadata only. Output per bin: file count, total bytes, fill
    * ratio. Oversized single files get their own bin by construction.
    *
    * Scale: the plan costs |files| metadata rows — the data plane is
    * untouched until the rewrite executes; one window over the
    * inventory, one |bins| aggregate.
    */
  private val q294 = Q("q294_compaction_plan",
    (s, d) => {
      val target = 131072L
      val files = Tables.orders(s, d)
        .groupBy(date_trunc("month", col("o_orderdate")).as("mon"),
          col("o_orderpriority").as("pri"))
        .agg((count(lit(1)) * 64L).as("bytes"))
      val ord = Window.orderBy(desc("bytes"), asc("mon"), asc("pri"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val planned = files
        .withColumn("cum_after", sum(col("bytes")).over(ord))
        .withColumn("bin_id", expr(s"(cum_after - bytes) div ${target}L"))
      planned.groupBy("bin_id")
        .agg(count(lit(1)).as("n_files"), sum(col("bytes")).as("bin_bytes"))
        .withColumn("fill_pct",
          col("bin_bytes").cast("double") / lit(target.toDouble) * 100.0)
        .orderBy("bin_id")
    },
    Some("""WITH f AS (SELECT date_trunc('month', o_orderdate) AS mon,
          o_orderpriority AS pri, COUNT(*) * 64 AS bytes
        FROM orders GROUP BY 1, 2),
      p AS (SELECT bytes,
          SUM(bytes) OVER (ORDER BY bytes DESC, mon, pri
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_after
        FROM f),
      b AS (SELECT CAST((cum_after - bytes) // 131072 AS BIGINT) AS bin_id, bytes
        FROM p)
      SELECT bin_id, CAST(COUNT(*) AS BIGINT) AS n_files,
        CAST(SUM(bytes) AS BIGINT) AS bin_bytes,
        CAST(SUM(bytes) AS DOUBLE) / 131072.0::DOUBLE * 100.0::DOUBLE AS fill_pct
      FROM b GROUP BY bin_id ORDER BY bin_id"""))

  /** Leakage-safe K-fold target encoding: encode o_orderpriority by the
    * mean o_totalprice computed from the OTHER four folds (fold =
    * o_orderkey % 5) — enc(pri, fold) = (Σ_all − Σ_fold)/(n_all −
    * n_fold). Both sums ride the exact decimal route so the
    * subtraction is exact and the encoding is partition-count- and
    * engine-invariant. Emitting the (pri, fold) encoding TABLE (joined
    * back to rows at train time) instead of a per-row column keeps the
    * output |pri|×K.
    *
    * Scale: one (pri, fold) aggregation over the facts, then windows
    * over the 25-row table. The encode-join back to the fact table is
    * a broadcast by construction.
    */
  private val q295 = Q("q295_target_encoding",
    (s, d) => {
      // keep the per-fold sum DECIMAL through the window so sum_all −
      // sum_fold is exact; only the final quotient is a double op
      val byFold = Tables.orders(s, d)
        .select(col("o_orderpriority").as("pri"),
          pmod(col("o_orderkey"), lit(5)).cast("int").as("fold"),
          col("o_totalprice"))
        .groupBy("pri", "fold")
        .agg(count(lit(1)).as("n_fold"),
          sum(col("o_totalprice").cast("decimal(38,6)")).as("sum_fold_dec"))
      val overPri = Window.partitionBy("pri")
      byFold
        .withColumn("n_all", sum(col("n_fold")).over(overPri))
        .withColumn("sum_all_dec", sum(col("sum_fold_dec")).over(overPri))
        .select(col("pri"), col("fold"), col("n_fold"),
          ((col("sum_all_dec") - col("sum_fold_dec")).cast("double")
            / (col("n_all") - col("n_fold")).cast("double")).as("oof_mean"))
        .orderBy("pri", "fold")
    },
    Some("""WITH bf AS (SELECT o_orderpriority AS pri,
          CAST(o_orderkey % 5 AS INTEGER) AS fold,
          COUNT(*) AS n_fold,
          SUM(CAST(CAST(o_totalprice AS VARCHAR) AS DECIMAL(38,6))) AS sum_fold_dec
        FROM orders GROUP BY 1, 2)
      SELECT pri, fold, CAST(n_fold AS BIGINT) AS n_fold,
        CAST(CAST(SUM(sum_fold_dec) OVER (PARTITION BY pri) - sum_fold_dec
            AS VARCHAR) AS DOUBLE)
          / CAST(SUM(n_fold) OVER (PARTITION BY pri) - n_fold AS DOUBLE) AS oof_mean
      FROM bf ORDER BY pri, fold"""))

  /** Seasonal-naive forecast quality (MASE-style): daily event counts
    * per type, forecast(t) = y(t−7 days); score = Σ|y−ŷ| over the
    * forecastable days divided by the 1-step naive error Σ|y_t −
    * y_{t−1}| on the same days — the scale-free forecastability census
    * run before fitting anything heavier. Counts are integers, so both
    * error sums are EXACT integers and the ratio is one double
    * division; days with no 7-back observation are excluded (not
    * zero-filled) and n_scored says how many scored.
    *
    * Scale: one (type, day) aggregation bounds everything downstream
    * by |types × days|; the lag windows run on that table, not the
    * tape.
    */
  private val q296 = Q("q296_seasonal_mase",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), expr("ts_ms div 86400000").as("day"))
        .agg(count(lit(1)).as("y"))
      val w = Window.partitionBy("event_type").orderBy("day")
      val scored = daily
        .withColumn("y_prev", lag(col("y"), 1).over(w))
        .withColumn("prev_day", lag(col("day"), 1).over(w))
        .withColumn("y_season", lag(col("y"), 7).over(w))
        .withColumn("season_day", lag(col("day"), 7).over(w))
        // the tape is dense per type, but require TRUE calendar lags so
        // the estimator stays honest if a type goes dark for a day
        .filter(col("season_day") === col("day") - 7 &&
          col("prev_day") === col("day") - 1)
      scored.groupBy("event_type")
        .agg(count(lit(1)).as("n_scored"),
          sum(abs(col("y") - col("y_season"))).as("seasonal_abs_err"),
          sum(abs(col("y") - col("y_prev"))).as("naive_abs_err"))
        .withColumn("mase", col("seasonal_abs_err").cast("double")
          / col("naive_abs_err").cast("double"))
        .orderBy("event_type")
    },
    Some("""WITH daily AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day,
          COUNT(*) AS y
        FROM events GROUP BY 1, 2),
      l AS (SELECT event_type, day, y,
          lag(y, 1) OVER w AS y_prev, lag(day, 1) OVER w AS prev_day,
          lag(y, 7) OVER w AS y_season, lag(day, 7) OVER w AS season_day
        FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day))
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_scored,
        CAST(SUM(abs(y - y_season)) AS BIGINT) AS seasonal_abs_err,
        CAST(SUM(abs(y - y_prev)) AS BIGINT) AS naive_abs_err,
        CAST(SUM(abs(y - y_season)) AS DOUBLE)
          / CAST(SUM(abs(y - y_prev)) AS DOUBLE) AS mase
      FROM l WHERE season_day = day - 7 AND prev_day = day - 1
      GROUP BY event_type ORDER BY event_type"""))

  override val all: Seq[Q] = Seq(q291, q292, q293, q294, q295, q296)
}
