package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{OracleSql, Tables}
import graft.functions.StableAgg
import graft.operators.{Dedup, TextAnalysis}

/** Data-governance and data-selection extensions (round 8, session 3):
  * Johnson–Lindenstrauss sketch projection (the dimensionality cut before
  * LSH/clustering at embedding scale), DSIR-style importance weighting
  * (Xie et al. 2023's target-vs-source LM ratio, in the library's
  * log-free linear domain), a k-anonymity audit over quasi-identifier
  * groups (the privacy gate a dataset release runs), and per-group OLS
  * trend fitting via exact decimal moments (the q82 device extended to
  * regression).
  */
/** SINGLE OWNER of the erasure-request draw shared by q306 (batch cascade)
  * and q311 (streaming cascade) on both engine sides: the ~5 % salted hash
  * draw of user ids standing in for the external deletion-request (DSR)
  * table. An edit here moves the whole erasure family together — the two
  * Spark queries AND their DuckDB oracles — so the draw can never
  * desynchronize between the batch and streaming twins.
  */
private[queries] object ErasureFixture {
  import graft.operators.Dedup

  /** The request list, collected to a KB-scale driver value (the q302
    * probe-key collect class). Both consumers turn it into a LITERAL
    * local relation — deriving it as live filter lineage lets
    * InferFiltersFromConstraints copy the md5-chain predicate onto the
    * corpus scan (8 md5 calls per corpus row; profiled 3× slowdown).
    *
    * Memoized per (JVM, sfDir) — the same device as
    * StreamFixtures.replayRows, and for the same reason: the draw is a
    * deterministic fixture of the dataset, so q306's three bench rounds
    * and every certificate call share ONE distinct+collect instead of
    * each paying fixture construction that its streaming twin q311 (which
    * already memoized through replayRows) never paid. Build outside any
    * lock; a putIfAbsent race at worst duplicates one cheap collect.
    */
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, IndexedSeq[Long]]()
  def requestedUsers(s: SparkSession, d: String): IndexedSeq[Long] = {
    val hit = memo.get(d)
    if (hit != null) return hit
    val built = Tables.events(s, d).select(col("user_id")).distinct()
      .filter(Dedup.hexHash32(md5(concat(lit("erase:"),
        col("user_id").cast("string")))) % 20 === 0)
      .collect().map(_.getLong(0)).toIndexedSeq
    val prev = memo.putIfAbsent(d, built)
    if (prev != null) prev else built
  }

  /** DuckDB mirror of [[requestedUsers]] as a CTE body. */
  val oracleDelCte: String = {
    val h = "md5('erase:' || user_id)"
    s"""SELECT DISTINCT user_id FROM events
          WHERE (${TrainingDataQueries.duckHash32(h)}) % 20 = 0"""
  }
}

object GovernanceQueries extends Registry {

  private val JlDims = 16
  private val InDims = 64

  /** Johnson–Lindenstrauss random-sign projection 64 → 16 dims
    * (Achlioptas 2003's ±1 database-friendly variant): the sign matrix
    * derives from the library's md5 hash device — computed BY THE ENGINE
    * (1024-row index build over `spark.range`, the hexHash32∘md5 chain
    * that is spec-asserted equal to the DuckDB mirror) and shipped back
    * into the scan as ONE nested-array literal (the typedLit rule). Each
    * projected coordinate is a zip_with product + left-to-right aggregate
    * fold, so the doubles are bit-identical cross-engine (the VecOps
    * order discipline).
    *
    * Scale: projection is scan-local codegen over the vector column —
    * zero shuffle, constant KB-size sign matrix at any corpus scale; the
    * 1024-row collect is an index build, not a data-path collect. This
    * is the standard pre-LSH/pre-cluster dimensionality cut: downstream
    * ops pay 16 dims instead of 64 with (1±ε) pairwise-distance
    * preservation (certificate-spec-asserted).
    */
  private val q212 = Q("q212_jl_projection",
    (s, d) => {
      // sign matrix via the engine's own hash chain (== duckHash32 mirror)
      val sgRows = s.range(0L, (JlDims * InDims).toLong)
        .select(col("id"),
          when(Dedup.hexHash32(md5(concat(lit("jl:"),
            expr(s"id div $InDims").cast("string"), lit(":"),
            (col("id") % InDims).cast("string")))) % 2 === 0, lit(1.0d))
            .otherwise(lit(-1.0d)).as("sg"))
        .orderBy("id").collect().map(_.getDouble(1))
      val signs: Seq[Seq[Double]] =
        sgRows.grouped(InDims).map(_.toSeq).toSeq
      val sgLit = typedLit(signs)
      val e = Tables.fanOut(Tables.embeddings(s, d))
        .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
      e.select(col("vec_id"),
          explode(sequence(lit(0), lit(JlDims - 1))).as("dim"), col("vec"))
        .select(col("vec_id"), col("dim").cast("long").as("dim"),
          aggregate(
            zip_with(col("vec"), element_at(sgLit, col("dim") + 1),
              (x, sg) => x * sg),
            lit(0.0d), (a, v) => a + v).as("proj"))
        .orderBy("vec_id", "dim")
    },
    Some {
      val h = s"md5('jl:' || (r.i // $InDims) || ':' || (r.i % $InDims))"
      s"""WITH sg AS (SELECT CAST(r.i // $InDims AS BIGINT) AS j,
          CAST(r.i % $InDims AS BIGINT) AS i,
          CASE WHEN (${TrainingDataQueries.duckHash32(h)}) % 2 = 0
            THEN 1.0::DOUBLE ELSE -1.0::DOUBLE END AS sgn
        FROM range(0, ${JlDims * InDims}) r(i)),
      sl AS (SELECT j, list(sgn ORDER BY i) AS sv FROM sg GROUP BY j),
      x AS (SELECT e.vec_id, sl.j AS dim,
          list_reduce(list_prepend(0.0::DOUBLE,
            list_transform(range(1, len(e.embedding) + 1),
              i -> CAST(e.embedding[i] AS DOUBLE) * sl.sv[i])),
            (a, v) -> a + v) AS proj
        FROM embeddings e CROSS JOIN sl)
      SELECT vec_id, dim, proj FROM x ORDER BY vec_id, dim"""
    })

  /** k-anonymity audit (Sweeney 2002) over quasi-identifier groups — the
    * release gate a governed dataset runs before publication: every row
    * falls in a QI group (event_type, UTC day, value decile-bucket); a
    * group is releasable iff ≥ k rows share the exact QI tuple, otherwise
    * its rows need suppression/generalization. Output = the full QI-group
    * census with the k≥5 decision per group.
    *
    * Scale: one partial/final aggregate on the QI key — |groups| ≪ |rows|
    * output; at 100 TB this is the same shape as any keyed census, and
    * the releasability decision is per-group arithmetic after the
    * aggregate. Day crosses the gate as a yyyy-MM-dd string (the q145
    * date-dtype device).
    */
  private val q213 = Q("q213_k_anonymity",
    (s, d) => {
      Tables.events(s, d)
        .select(col("event_type"),
          date_format(col("ts_utc"), "yyyy-MM-dd").as("day"),
          floor(col("value") / 10.0d).cast("long").as("value_bucket"))
        .groupBy("event_type", "day", "value_bucket")
        .agg(count(lit(1)).as("n"))
        .withColumn("anonymous", col("n") >= 5L)
        .orderBy("event_type", "day", "value_bucket")
    },
    Some("""SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
        CAST(floor(value / 10.0::DOUBLE) AS BIGINT) AS value_bucket,
        CAST(COUNT(*) AS BIGINT) AS n, COUNT(*) >= 5 AS anonymous
      FROM events GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""))

  /** DSIR-style importance weighting (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every
    * document by the ratio of its target-domain LM fit to its
    * source-pool LM fit — here add-one unigram models trained on the
    * lang='en' subset (target) vs the whole corpus (source), with the
    * per-doc mean token probability in the library's log-free LINEAR
    * domain (the q142 rationale: each p is one IEEE division of exact
    * integers, means ride the scale-18 decimal route, and the ratio of
    * two bit-exact means is one more correctly-rounded division — where
    * the published log-importance would need libm `ln`, which no
    * cross-engine hash can gate).
    *
    * Scale: the corpus explodes to tokens ONCE; both model tables are
    * vocabulary-sized (AQE broadcasts them), the three corpus scalars
    * crossJoin as a 1-row broadcast, and the per-doc reduction is a
    * partial/final decimal aggregate — the corpus never shuffles for the
    * model joins. Exactly the profile that lets DSIR score a 100 TB
    * crawl in one pass.
    */
  private val q214 = Q("q214_dsir_importance",
    (s, d) => {
      val toks = Tables.fanOut(Tables.documents(s, d))
        .select(col("doc_id"), col("lang"),
          explode(TextAnalysis.tokens(col("text"))).as("t"))
      val ct = toks.filter(col("lang") === "en")
        .groupBy("t").agg(count(lit(1)).as("ct"))
      val cs = toks.groupBy("t").agg(count(lit(1)).as("cs"))
      val stats = toks.agg(
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("nt"),
        count(lit(1)).as("ns"),
        countDistinct(col("t")).as("v"))
      toks.join(ct, Seq("t"), "left")
        .join(cs, Seq("t"))
        .crossJoin(broadcast(stats))
        .withColumn("pt", (coalesce(col("ct"), lit(0L)) + 1L).cast("double") /
          (col("nt") + col("v")).cast("double"))
        .withColumn("ps", (col("cs") + 1L).cast("double") /
          (col("ns") + col("v")).cast("double"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_toks"),
          StableAgg.dsum(col("pt"), 18).as("spt"),
          StableAgg.dsum(col("ps"), 18).as("sps"))
        .select(col("doc_id"), col("n_toks"),
          (col("spt") / col("n_toks").cast("double")).as("avg_p_target"),
          (col("sps") / col("n_toks").cast("double")).as("avg_p_source"),
          ((col("spt") / col("n_toks").cast("double")) /
            (col("sps") / col("n_toks").cast("double"))).as("importance"))
        .orderBy("doc_id")
    },
    Some(s"""WITH tk AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS t
        FROM documents),
      ct AS (SELECT t, COUNT(*) AS ct FROM tk WHERE lang = 'en' GROUP BY t),
      cs AS (SELECT t, COUNT(*) AS cs FROM tk GROUP BY t),
      st AS (SELECT CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS nt,
          CAST(COUNT(*) AS BIGINT) AS ns, COUNT(DISTINCT t) AS v FROM tk),
      sc AS (SELECT tk.doc_id,
          CAST(coalesce(ct.ct, 0) + 1 AS DOUBLE) / CAST(st.nt + st.v AS DOUBLE) AS pt,
          CAST(cs.cs + 1 AS DOUBLE) / CAST(st.ns + st.v AS DOUBLE) AS ps
        FROM tk LEFT JOIN ct ON tk.t = ct.t
          JOIN cs ON tk.t = cs.t
          CROSS JOIN st),
      ag AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_toks,
          ${OracleSql.dsum("pt", 18)} AS spt,
          ${OracleSql.dsum("ps", 18)} AS sps
        FROM sc GROUP BY doc_id)
      SELECT doc_id, n_toks,
        spt / CAST(n_toks AS DOUBLE) AS avg_p_target,
        sps / CAST(n_toks AS DOUBLE) AS avg_p_source,
        (spt / CAST(n_toks AS DOUBLE)) / (sps / CAST(n_toks AS DOUBLE)) AS importance
      FROM ag ORDER BY doc_id"""))

  /** Per-group OLS trend fit (value vs hour-of-day per event_type) in
    * closed form from exact decimal moments — the q82 corr/covar device
    * extended to regression: n, Σx, Σx² stay in integer space, Σy, Σxy
    * ride the decimal route, and slope/intercept/R² are the same few
    * correctly-rounded double ops applied to bit-exact totals on both
    * engines (libm-free: squares and divisions only).
    *
    * Scale: one partial/final aggregate — six fixed-width moment partials
    * per group combine map-side, the exchange ships |groups| rows, and
    * the fit itself is per-group scalar arithmetic after the aggregate.
    * The standard distributed closed-form OLS; no iteration, no driver
    * math.
    */
  private val q215 = Q("q215_group_ols",
    (s, d) => {
      val e = Tables.events(s, d)
        .select(col("event_type"), hour(col("ts_utc")).cast("long").as("x"),
          col("value").as("y"))
      e.groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sxx"),
          StableAgg.dsum(col("y")).as("sy"),
          StableAgg.dsum(col("x").cast("double") * col("y")).as("sxy"),
          StableAgg.dsum(col("y") * col("y")).as("syy"))
        .withColumn("nd", col("n").cast("double"))
        .withColumn("sxd", col("sx").cast("double"))
        .withColumn("sxxd", col("sxx").cast("double"))
        .withColumn("slope",
          ((col("nd") * col("sxy")) - (col("sxd") * col("sy"))) /
            ((col("nd") * col("sxxd")) - (col("sxd") * col("sxd"))))
        .withColumn("intercept",
          (col("sy") - (col("slope") * col("sxd"))) / col("nd"))
        .withColumn("r2",
          (((col("nd") * col("sxy")) - (col("sxd") * col("sy"))) *
            ((col("nd") * col("sxy")) - (col("sxd") * col("sy")))) /
            (((col("nd") * col("sxxd")) - (col("sxd") * col("sxd"))) *
              ((col("nd") * col("syy")) - (col("sy") * col("sy")))))
        .select("event_type", "n", "slope", "intercept", "r2")
        .orderBy("event_type")
    },
    Some(s"""WITH c AS (SELECT event_type, COUNT(*) AS n,
          CAST(SUM(hour(ts)) AS BIGINT) AS sx,
          CAST(SUM(hour(ts) * hour(ts)) AS BIGINT) AS sxx,
          ${OracleSql.dsum("value")} AS sy,
          ${OracleSql.dsum("CAST(hour(ts) AS DOUBLE) * value")} AS sxy,
          ${OracleSql.dsum("value * value")} AS syy
        FROM events GROUP BY event_type)
      SELECT event_type, n,
        ((CAST(n AS DOUBLE) * sxy) - (CAST(sx AS DOUBLE) * sy)) /
          ((CAST(n AS DOUBLE) * sxx) - (CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) AS slope,
        (sy - ((((CAST(n AS DOUBLE) * sxy) - (CAST(sx AS DOUBLE) * sy)) /
          ((CAST(n AS DOUBLE) * sxx) - (CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))))
          * CAST(sx AS DOUBLE))) / CAST(n AS DOUBLE) AS intercept,
        ((((CAST(n AS DOUBLE) * sxy) - (CAST(sx AS DOUBLE) * sy))) *
         (((CAST(n AS DOUBLE) * sxy) - (CAST(sx AS DOUBLE) * sy)))) /
          ((((CAST(n AS DOUBLE) * sxx) - (CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))) *
           (((CAST(n AS DOUBLE) * syy) - (sy * sy)))) AS r2
      FROM c ORDER BY event_type"""))

  /** Luhn checksum detection (ISO/IEC 7812's mod-10 check — the
    * validity test that separates a real card/account number from a
    * random 16-digit string, the precision filter every PII scrubber
    * runs after its regex pass; complements q71's pattern-level
    * redaction): derive a deterministic 16-digit candidate per order,
    * evaluate the checksum as a higher-order fold over the digits
    * (double every second digit from the right, subtract 9 past 9, sum
    * mod 10), and census validity per order priority. ~1/10 of
    * candidates pass — exactly the checksum's discriminating power.
    *
    * Scale: the digit fold is a codegen'd per-row HOF chain — zero
    * shuffle before the |priorities|-row aggregate; at 100 TB this is a
    * scan-speed column like every other quality signal.
    */
  private val q233 = Q("q233_luhn_pii",
    (s, d) => {
      val pan = lpad(((col("o_orderkey") * 48271L) % 10000000000000000L)
        .cast("string"), 16, "0")
      val digitTerms = sequence(lit(1), lit(16))
      val luhnSum = aggregate(digitTerms, lit(0L), (acc, i) => {
        val dig = col("pan").substr(lit(17) - i, lit(1)).cast("long")
        val term = when(i % 2 === 0,
          when(dig * 2 > 9, dig * 2 - 9).otherwise(dig * 2)).otherwise(dig)
        acc + term
      })
      Tables.fanOut(Tables.orders(s, d)) // r14: the 16-digit luhn aggregate off the 1-task scan
        .select(col("o_orderkey"), col("o_orderpriority"), pan.as("pan"))
        .withColumn("luhn_valid", (luhnSum % 10) === 0)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(when(col("luhn_valid"), 1L).otherwise(0L)).as("n_valid"),
          sum(when(col("luhn_valid"), col("o_orderkey")).otherwise(0L))
            .as("valid_key_sum"))
        .withColumn("valid_rate",
          col("n_valid").cast("double") / col("n").cast("double"))
        .orderBy("o_orderpriority")
    },
    Some("""WITH p AS (SELECT o_orderkey, o_orderpriority,
          lpad(CAST((o_orderkey * 48271) % 10000000000000000 AS VARCHAR),
            16, '0') AS pan
        FROM orders),
      l AS (SELECT o_orderkey, o_orderpriority,
          list_sum(list_transform(range(1, 17), i ->
            CASE WHEN i % 2 = 0 THEN
              CASE WHEN CAST(substr(pan, CAST(17 - i AS INTEGER), 1)
                    AS BIGINT) * 2 > 9
                THEN CAST(substr(pan, CAST(17 - i AS INTEGER), 1)
                    AS BIGINT) * 2 - 9
                ELSE CAST(substr(pan, CAST(17 - i AS INTEGER), 1)
                    AS BIGINT) * 2 END
            ELSE CAST(substr(pan, CAST(17 - i AS INTEGER), 1) AS BIGINT)
            END)) % 10 = 0 AS luhn_valid
        FROM p)
      SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CASE WHEN luhn_valid THEN 1 ELSE 0 END) AS BIGINT)
          AS n_valid,
        CAST(SUM(CASE WHEN luhn_valid THEN o_orderkey ELSE 0 END) AS BIGINT)
          AS valid_key_sum,
        CAST(SUM(CASE WHEN luhn_valid THEN 1 ELSE 0 END) AS DOUBLE)
          / CAST(COUNT(*) AS DOUBLE) AS valid_rate
      FROM l GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Column-level encryption round trip (`aes_encrypt`/`aes_decrypt`,
    * ECB for the deterministic-token use case, GCM for storage): the
    * governance contract is gated, not the ciphertext — (1) decrypt ∘
    * encrypt is the identity on every row (both modes), (2)
    * deterministic-mode ciphertexts are equal iff plaintexts are equal
    * (the property that keeps encrypted JOIN keys joinable — counted
    * via distinct-ciphertext == distinct-plaintext), and (3) GCM
    * ciphertexts of identical plaintexts NEVER repeat (random IV — the
    * property that makes GCM safe for storage and WRONG for join keys).
    * The oracle states the same contracts as computed booleans over the
    * plaintext side.
    *
    * Scale: AES rides whole-stage codegen per row, keys stay literals
    * (production: per-column data keys under a KMS-wrapped master);
    * encrypted columns join/group exactly like plaintext in ECB-token
    * form at identical shuffle shape.
    */
  private val q273 = Q("q273_aes_column_crypto",
    (s, d) => {
      val key = "0123456789abcdef" // 16-byte demo key; prod: KMS-issued
      val enc = Tables.fanOut(Tables.customer(s, d))
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .withColumn("ct_det",
          expr(s"aes_encrypt(c_name, '$key', 'ECB')"))
        .withColumn("ct_gcm",
          expr(s"aes_encrypt(c_name, '$key', 'GCM')"))
        .withColumn("rt_det",
          expr(s"CAST(aes_decrypt(ct_det, '$key', 'ECB') AS STRING)"))
        .withColumn("rt_gcm",
          expr(s"CAST(aes_decrypt(ct_gcm, '$key', 'GCM') AS STRING)"))
      enc.groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          sum(when(col("rt_det") === col("c_name"), 1L).otherwise(0L))
            .as("n_det_roundtrip"),
          sum(when(col("rt_gcm") === col("c_name"), 1L).otherwise(0L))
            .as("n_gcm_roundtrip"),
          countDistinct(col("c_name")).as("n_distinct_plain"),
          countDistinct(col("ct_det")).as("n_distinct_det_ct"),
          countDistinct(col("ct_gcm")).as("n_distinct_gcm_ct"))
        .select(col("c_mktsegment"), col("n"),
          (col("n_det_roundtrip") === col("n")).as("det_roundtrip_ok"),
          (col("n_gcm_roundtrip") === col("n")).as("gcm_roundtrip_ok"),
          (col("n_distinct_det_ct") === col("n_distinct_plain"))
            .as("det_join_key_safe"),
          (col("n_distinct_gcm_ct") === col("n")).as("gcm_never_repeats"),
          col("n_distinct_plain"))
        .orderBy("c_mktsegment")
    },
    Some("""SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
        TRUE AS det_roundtrip_ok, TRUE AS gcm_roundtrip_ok,
        TRUE AS det_join_key_safe, TRUE AS gcm_never_repeats,
        CAST(COUNT(DISTINCT c_name) AS BIGINT) AS n_distinct_plain
      FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** Structured log-line parsing (`regexp_extract_all` + split
    * key=value pairs): each event is serialized to the semicolon
    * key=value wire format every fluentd/syslog pipeline emits, then
    * parsed BACK by a generic extractor (regex over the line, not
    * positional knowledge), validated field-by-field. The round trip
    * is exact: numeric fields re-parse with try_cast and must equal the
    * originals (counted), unknown keys are counted as residue.
    *
    * Scale: pure scan-local regex work — the classic bronze-layer
    * parse; the only shuffle is the final census.
    */
  private val q274 = Q("q274_kv_log_parse",
    (s, d) => {
      val line = concat(lit("ts="), col("ts_ms"), lit(";user="),
        col("user_id"), lit(";type="), col("event_type"),
        lit(";val="), col("value"), lit(";src=app7"))
      val parsed = Tables.fanOut(Tables.events(s, d))
        .select(col("event_id"), col("ts_ms"), col("user_id"),
          col("event_type"), col("value"), line.as("line"))
        .withColumn("kvs",
          expr("regexp_extract_all(line, '([a-z]+)=([^;]*)', 0)"))
        .withColumn("ts_p",
          expr("try_cast(regexp_extract(line, 'ts=([^;]*)', 1) AS BIGINT)"))
        .withColumn("user_p",
          expr("try_cast(regexp_extract(line, 'user=([^;]*)', 1) AS BIGINT)"))
        .withColumn("type_p", regexp_extract(col("line"), "type=([^;]*)", 1))
        .withColumn("val_p",
          expr("try_cast(regexp_extract(line, 'val=([^;]*)', 1) AS DOUBLE)"))
      parsed.groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(when(size(col("kvs")) === 5, 1L).otherwise(0L)).as("n_five_pairs"),
          sum(when(col("ts_p") === col("ts_ms") && col("user_p") === col("user_id")
            && col("type_p") === col("event_type"), 1L).otherwise(0L))
            .as("n_exact_int_fields"),
          sum(when(col("val_p") === col("value"), 1L).otherwise(0L))
            .as("n_exact_double"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        CAST(COUNT(*) AS BIGINT) AS n_five_pairs,
        CAST(COUNT(*) AS BIGINT) AS n_exact_int_fields,
        CAST(COUNT(*) AS BIGINT) AS n_exact_double
      FROM events GROUP BY event_type ORDER BY event_type"""))

  /** Schema-drift census over semi-structured payloads
    * (`json_object_keys` + explode): the ingest-monitoring view that
    * catches a producer adding/removing fields BEFORE downstream
    * parsers break — per field key: row coverage, first/last day seen.
    * The payload is the props fixture evolved deterministically (a
    * `beta` field on 30 % of rows, an `exp` field on the id-mod-7
    * slice), so partial-coverage keys exist by construction and the
    * census must report exactly their arithmetic.
    *
    * Scale: key extraction is scan-local; the census is |distinct
    * keys| × days — monitoring cost is independent of row count after
    * the first aggregate, which is why this runs on every ingest batch
    * in production.
    */
  private val q277 = Q("q277_schema_drift_census",
    (s, d) => {
      val payload = concat(
        regexp_replace(col("props"), "\\}$", ""),
        when(pmod(col("event_id"), lit(10)) < 3, lit(",\"beta\":1"))
          .otherwise(lit("")),
        when(pmod(col("event_id"), lit(7)) === 0, lit(",\"exp\":\"x\""))
          .otherwise(lit("")),
        lit("}"))
      Tables.fanOut(Tables.events(s, d))
        .withColumn("payload", payload)
        .select(expr("ts_ms div 86400000").as("day"),
          explode(expr("json_object_keys(payload)")).as("field"))
        .groupBy("field")
        .agg(count(lit(1)).as("n_rows"),
          min("day").as("first_day"), max("day").as("last_day"))
        .orderBy("field")
    },
    Some("""WITH p AS (SELECT event_id, epoch_ms(ts) // 86400000 AS day,
          regexp_replace(props, '\}$', '')
            || (CASE WHEN event_id % 10 < 3 THEN ',"beta":1' ELSE '' END)
            || (CASE WHEN event_id % 7 = 0 THEN ',"exp":"x"' ELSE '' END)
            || '}' AS payload
        FROM events),
      k AS (SELECT day, unnest(json_keys(payload)) AS field FROM p)
      SELECT field, CAST(COUNT(*) AS BIGINT) AS n_rows,
        CAST(MIN(day) AS BIGINT) AS first_day,
        CAST(MAX(day) AS BIGINT) AS last_day
      FROM k GROUP BY field ORDER BY field"""))

  /** Right-to-be-forgotten cascade audit (the GDPR/CCPA erasure job a
    * governed corpus runs): a deletion-request list (here a deterministic
    * ~5 % hash draw of user ids, standing in for the external DSR table)
    * is cascaded through `events` as LEFT SEMI (the rows to erase) and
    * LEFT ANTI (the surviving table) joins against the SAME list, and the
    * audit emits the per-event-type before/erased/after ledger plus the
    * distinct users actually erased — the artifact a compliance review
    * asks for. GovernanceCertificatesSpec carries the two whole-result
    * obligations the ledger can't state row-wise: the semi/anti split
    * partitions the table exactly, and the survivor set contains ZERO
    * rows of any requested user.
    *
    * Scale: the deletion list is always tiny vs the corpus (thousands of
    * requests vs 100 TB), so both cascade joins broadcast the list and
    * the corpus never shuffles; the erasure rewrite itself is the q239
    * deletion-vector / q205 compaction path — this query is the AUDIT
    * that decides and certifies it.
    */
  private val q306 = Q("q306_erasure_cascade",
    (s, d) => {
      val ev = Tables.events(s, d)
      // the "deletion request" list as a LITERAL local relation — see
      // ErasureFixture for the draw AND the reason it must be literal
      // (the InferFiltersFromConstraints corpus-scan trap)
      val requested = ErasureFixture.requestedUsers(s, d)
      val del = s.createDataFrame(requested.map(Tuple1(_))).toDF("user_id")
      val erased = ev.join(del, Seq("user_id"), "left_semi")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_erased"),
          countDistinct(col("user_id")).as("n_users_erased"))
      val retained = ev.join(del, Seq("user_id"), "left_anti")
        .groupBy("event_type").agg(count(lit(1)).as("n_after"))
      erased.join(retained, Seq("event_type"), "full_outer")
        .select(col("event_type"),
          (coalesce(col("n_erased"), lit(0L)) +
            coalesce(col("n_after"), lit(0L))).as("n_before"),
          coalesce(col("n_erased"), lit(0L)).as("n_erased"),
          coalesce(col("n_after"), lit(0L)).as("n_after"),
          coalesce(col("n_users_erased"), lit(0L)).as("n_users_erased"))
        .orderBy("event_type")
    },
    Some {
      s"""WITH del AS (${ErasureFixture.oracleDelCte})
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_before,
          CAST(SUM(CASE WHEN d.user_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_erased,
          CAST(SUM(CASE WHEN d.user_id IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_after,
          CAST(COUNT(DISTINCT CASE WHEN d.user_id IS NOT NULL
            THEN e.user_id END) AS BIGINT) AS n_users_erased
        FROM events e LEFT JOIN del d ON e.user_id = d.user_id
        GROUP BY event_type ORDER BY event_type"""
    })

  /** Declarative data-contract audit (the Great-Expectations-style release
    * gate a governed table runs on every ingest): six contract clauses over
    * `orders` (+ the lineitem→orders referential clause) evaluate in ONE
    * conditional-aggregation pass plus ONE anti-join — key uniqueness,
    * non-null positive amounts, date-domain bounds, status/priority value
    * domains, and FK coverage — emitting the per-clause
    * (checked, violations, pass) ledger a contract report renders. The
    * clause set is data-independent, so the output cardinality is fixed
    * and the hash gate pins every count.
    *
    * Scale: clauses c1-c5 share one scan of orders (COUNT/COUNT DISTINCT/
    * conditional sums all partial-aggregate map-side; the distinct rides
    * the q308 expand route); the referential clause is a lineitem⋈orders
    * LEFT ANTI on the join key — the standard distributed RI audit, one
    * shuffle on orderkey (bucketable at 100 TB: q301's layout makes it
    * exchange-free). No clause collects anything row-scaled.
    */
  private val q310 = Q("q310_data_contract",
    (s, d) => {
      val o = Tables.orders(s, d)
      val oneRow = o.agg(
        count(lit(1)).as("n"),
        countDistinct(col("o_orderkey")).as("n_keys"),
        sum(when(col("o_totalprice").isNull ||
          col("o_totalprice") <= 0.0d, 1L).otherwise(0L)).as("v_price"),
        sum(when(col("o_orderdate") < lit("1992-01-01").cast("timestamp") ||
          col("o_orderdate") >= lit("1999-01-01").cast("timestamp"), 1L)
          .otherwise(0L)).as("v_date"),
        sum(when(!col("o_orderstatus").isin("F", "O", "P"), 1L)
          .otherwise(0L)).as("v_status"),
        sum(when(!col("o_orderpriority").rlike("^[1-5]-"), 1L)
          .otherwise(0L)).as("v_prio"))
      val ri = Tables.lineitem(s, d).select(col("l_orderkey"))
        .join(o.select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("v_fk"))
      val liN = Tables.lineitem(s, d).agg(count(lit(1)).as("n_li"))
      oneRow.crossJoin(ri).crossJoin(liN) // 1-row × 1-row × 1-row
        .select(explode(array(
          struct(lit("c1_orderkey_unique").as("clause"),
            col("n").as("checked"), (col("n") - col("n_keys")).as("violations")),
          struct(lit("c2_totalprice_positive").as("clause"),
            col("n").as("checked"), col("v_price").as("violations")),
          struct(lit("c3_orderdate_domain").as("clause"),
            col("n").as("checked"), col("v_date").as("violations")),
          struct(lit("c4_status_domain").as("clause"),
            col("n").as("checked"), col("v_status").as("violations")),
          struct(lit("c5_priority_format").as("clause"),
            col("n").as("checked"), col("v_prio").as("violations")),
          struct(lit("c6_lineitem_fk").as("clause"),
            col("n_li").as("checked"), col("v_fk").as("violations"))))
          .as("c"))
        .select(col("c.clause").as("clause"), col("c.checked").as("checked"),
          col("c.violations").as("violations"),
          (col("c.violations") === 0L).as("pass"))
        .orderBy("clause")
    },
    Some("""WITH a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
          CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_keys,
          CAST(SUM(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0.0
            THEN 1 ELSE 0 END) AS BIGINT) AS v_price,
          CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '1992-01-01'
            OR o_orderdate >= TIMESTAMP '1999-01-01'
            THEN 1 ELSE 0 END) AS BIGINT) AS v_date,
          CAST(SUM(CASE WHEN o_orderstatus NOT IN ('F','O','P')
            THEN 1 ELSE 0 END) AS BIGINT) AS v_status,
          CAST(SUM(CASE WHEN NOT regexp_matches(o_orderpriority, '^[1-5]-')
            THEN 1 ELSE 0 END) AS BIGINT) AS v_prio
        FROM orders),
      r AS (SELECT CAST(COUNT(*) AS BIGINT) AS v_fk FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
          WHERE o.o_orderkey = l.l_orderkey)),
      li AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_li FROM lineitem),
      c AS (
        SELECT 'c1_orderkey_unique' AS clause, n AS checked,
          n - n_keys AS violations FROM a
        UNION ALL SELECT 'c2_totalprice_positive', n, v_price FROM a
        UNION ALL SELECT 'c3_orderdate_domain', n, v_date FROM a
        UNION ALL SELECT 'c4_status_domain', n, v_status FROM a
        UNION ALL SELECT 'c5_priority_format', n, v_prio FROM a
        UNION ALL SELECT 'c6_lineitem_fk', li.n_li, r.v_fk FROM li, r)
      SELECT clause, checked, violations, violations = 0 AS pass
      FROM c ORDER BY clause"""))

  /** l-diversity audit (Machanavajjhala et al. 2007) — the companion gate
    * to q213's k-anonymity over the SAME quasi-identifier groups
    * (event_type, UTC day, value decile-bucket): a group of k
    * indistinguishable rows still leaks its sensitive attribute if all k
    * share one value, so releasability additionally requires ≥ l DISTINCT
    * sensitive values (here user_id, l = 3) per QI group. Output = the
    * full QI census with both group size and sensitive diversity, and the
    * combined release decision — exactly the table a privacy review signs.
    *
    * Scale: one aggregate on the QI key with a distinct-count on the
    * sensitive attribute — Spark plans COUNT(DISTINCT) as the two-phase
    * expand/partial-merge aggregate, so the corpus shuffles once on the
    * QI key; |groups| ≪ |rows| output. At 100 TB the exact distinct can
    * swap for the q156 HLL sketch with the same query shape.
    */
  private val q308 = Q("q308_l_diversity",
    (s, d) => {
      Tables.events(s, d)
        .select(col("event_type"),
          date_format(col("ts_utc"), "yyyy-MM-dd").as("day"),
          floor(col("value") / 10.0d).cast("long").as("value_bucket"),
          col("user_id"))
        .groupBy("event_type", "day", "value_bucket")
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("l_distinct"))
        .withColumn("diverse", col("n") >= 5L && col("l_distinct") >= 3L)
        .orderBy("event_type", "day", "value_bucket")
    },
    Some("""SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
        CAST(floor(value / 10.0::DOUBLE) AS BIGINT) AS value_bucket,
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(COUNT(DISTINCT user_id) AS BIGINT) AS l_distinct,
        (COUNT(*) >= 5 AND COUNT(DISTINCT user_id) >= 3) AS diverse
      FROM events GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""))

  /** k-anonymity ENFORCEMENT (the remediation step after q213's audit):
    * fine QI groups (event_type, UTC day, value decile-bucket) with
    * n ≥ k release as-is; failing groups GENERALIZE one rung up the
    * value hierarchy (decile → ventile-of-20 bucket, the standard
    * generalization-lattice move) and release if the coarsened group —
    * which pools ONLY failing fine groups, so released fine rows are
    * never re-keyed — reaches k; whatever still misses k is SUPPRESSED.
    * Output = the per-(event_type, day) disposition ledger (rows
    * released fine / released generalized / suppressed), i.e. the
    * utility-loss accounting a privacy office signs alongside q213's
    * audit. Every row lands in exactly one disposition, so the oracle
    * hash also pins conservation (certificate re-asserts it).
    *
    * Scale: two keyed aggregates (fine census, then a re-aggregate of
    * only the failing groups at the coarse key) plus per-group
    * arithmetic — |groups| ≪ |rows| after the first aggregate, so the
    * lattice walk costs metadata, not data; the same shape iterates up
    * taller hierarchies (day → week → month) without touching the
    * corpus again.
    */
  private val q312 = Q("q312_k_anon_generalize",
    (s, d) => {
      val k = 5L
      val fine = Tables.events(s, d)
        .select(col("event_type"),
          date_format(col("ts_utc"), "yyyy-MM-dd").as("day"),
          floor(col("value") / 10.0d).cast("long").as("b10"))
        .groupBy("event_type", "day", "b10")
        .agg(count(lit(1)).as("n"))
      val released = fine.filter(col("n") >= k)
      val failing = fine.filter(col("n") < k)
      val coarse = failing
        .withColumn("b20", floor(col("b10").cast("double") / 2.0d).cast("long"))
        .groupBy("event_type", "day", "b20")
        .agg(sum("n").as("cn"))
      val fineLedger = released
        .groupBy("event_type", "day")
        .agg(sum("n").as("n_fine"))
      val coarseLedger = coarse
        .groupBy("event_type", "day")
        .agg(sum(when(col("cn") >= k, col("cn")).otherwise(0L)).as("n_gen"),
          sum(when(col("cn") < k, col("cn")).otherwise(0L)).as("n_supp"))
      fineLedger.join(coarseLedger, Seq("event_type", "day"), "full_outer")
        .select(col("event_type"), col("day"),
          coalesce(col("n_fine"), lit(0L)).as("n_released_fine"),
          coalesce(col("n_gen"), lit(0L)).as("n_released_generalized"),
          coalesce(col("n_supp"), lit(0L)).as("n_suppressed"))
        .orderBy("event_type", "day")
    },
    Some("""WITH fine AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
          CAST(floor(value / 10.0::DOUBLE) AS BIGINT) AS b10,
          CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2, 3),
      coarse AS (SELECT event_type, day,
          CAST(floor(CAST(b10 AS DOUBLE) / 2.0::DOUBLE) AS BIGINT) AS b20,
          CAST(SUM(n) AS BIGINT) AS cn
        FROM fine WHERE n < 5 GROUP BY 1, 2, 3),
      fl AS (SELECT event_type, day, CAST(SUM(n) AS BIGINT) AS n_fine
        FROM fine WHERE n >= 5 GROUP BY 1, 2),
      cl AS (SELECT event_type, day,
          CAST(SUM(CASE WHEN cn >= 5 THEN cn ELSE 0 END) AS BIGINT) AS n_gen,
          CAST(SUM(CASE WHEN cn < 5 THEN cn ELSE 0 END) AS BIGINT) AS n_supp
        FROM coarse GROUP BY 1, 2)
      SELECT COALESCE(fl.event_type, cl.event_type) AS event_type,
        COALESCE(fl.day, cl.day) AS day,
        COALESCE(fl.n_fine, 0) AS n_released_fine,
        COALESCE(cl.n_gen, 0) AS n_released_generalized,
        COALESCE(cl.n_supp, 0) AS n_suppressed
      FROM fl FULL OUTER JOIN cl
        ON fl.event_type = cl.event_type AND fl.day = cl.day
      ORDER BY event_type, day"""))

  /** Truncated two-sided geometric noise (α = e^(−ε_node), ε_node = 0.5,
    * support ±B = ±40, renormalized) — SINGLE OWNER of the DP mechanism
    * shared by q319 (one-shot count release) and q321 (continual
    * counter), on BOTH engine sides: the CDF breakpoints are computed
    * once driver-side (the only exp/pow calls — libm never runs inside
    * either engine, the q229 sqrt-only discipline) and emitted as the
    * SAME shortest-round-trip double literals to Spark (typedLit) and
    * DuckDB (VARCHAR-cast list, the q300/q259 device). The inverse-CDF
    * draw is a codegen'd array HOF — an O(2B) scan of an 80-element
    * literal per released GROUP, not per corpus row.
    */
  private[queries] object GeomMechanism {
    val B = 40
    val epsNode = 0.5
    private val alpha = math.exp(-epsNode)
    private[queries] val rawMass: IndexedSeq[Double] =
      (-B to B).map(k => math.pow(alpha, math.abs(k)))
    /** breaks(i) = F(−B + i), the truncated CDF with the final 1.0
      * dropped; a draw is z = −B + |{F ≤ u}|. */
    private[queries] val breaks: IndexedSeq[Double] = {
      val total = rawMass.sum
      rawMass.scanLeft(0.0)(_ + _).tail.map(_ / total).dropRight(1)
    }
    /** z as a Column from a uniform-[0,1) column: −B + |{F ≤ u}| as an
      * unrolled 80-term comparison sum, NOT an array-HOF
      * (size(filter(lit(breaks), b ≤ u)) profiled ~1.3 ms/row: ArrayFilter
      * is CodegenFallback and pays interpreted lambda binding per element
      * — the whole q321 fixed floor was this draw; 80 inline comparisons
      * codegen to branch-free adds and the floor dropped ~2 s). The q62
      * expression-tree caveat doesn't bite at 80 leaves (it was 4096×k).
      */
    def draw(u: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      (breaks.map(b => when(lit(b) <= u, 1).otherwise(0)).reduce(_ + _)
        - lit(B)).cast("long")
    private val duckBreaks =
      breaks.map(b => s"CAST('$b' AS DOUBLE)").mkString("[", ", ", "]")
    /** DuckDB mirror of [[draw]] over a uniform expression `u`. */
    def duckDraw(u: String): String =
      s"CAST(len(list_filter($duckBreaks, b -> b <= $u)) - $B AS BIGINT)"
    /** Uniform from the library hash chain over a key expression. */
    def uniform(key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      Dedup.hexHash32(md5(key)).cast("double") / lit(4294967296.0d)
    def duckUniform(keyMd5: String): String =
      s"(CAST((${TrainingDataQueries.duckHash32(keyMd5)}) AS DOUBLE) / 4294967296.0::DOUBLE)"
  }

  /** ε-differentially-private count release — the third privacy pillar
    * next to the k-anonymity family (q213/q312) and the erasure cascade
    * (q306/q311): instead of suppressing or generalizing small groups,
    * EVERY released count carries calibrated integer noise, so no single
    * row's presence is inferable from the output (Ghosh, Roughgarden &
    * Sundararajan 2009's geometric mechanism — the discrete,
    * utility-optimal Laplace analogue; Dwork et al. 2006 for ε-DP
    * itself). Mechanism: z ~ two-sided geometric with α = e^(−ε),
    * truncated at ±B (B = 40; the tail mass beyond B is < 2·10⁻⁹ — the
    * standard bounded-noise variant) and renormalized, sampled by
    * inverse CDF from a uniform u derived with the library's
    * cross-engine hash chain (hexHash32∘md5 of the release key, u =
    * h/2³²). Released at TWO granularities in one pass — (event_type,
    * day) cells and the (event_type) marginal via ROLLUP — each at
    * ε = 0.5; the eps/eps_total columns are the sequential-composition
    * ledger (every input row feeds both releases, so the privacy spend
    * is their sum: basic composition). The draw key includes the
    * grouping id, so the two releases use independent noise.
    *
    * Determinism across engines: the CDF breakpoints are computed ONCE
    * driver-side (the only exp/pow calls — libm never runs inside
    * either engine, the q229 sqrt-only discipline) and emitted to BOTH
    * sides as the SAME shortest-round-trip double literals (the q300
    * compile-time-literal device; DuckDB parses them via VARCHAR casts
    * bit-exactly, the q259 lesson). The inverse-CDF probe is a
    * codegen'd array HOF — size(filter(breaks, b → b ≤ u)) − B — an
    * O(2B) scan of an 80-element literal per RELEASED GROUP, not per
    * row. A production release drops n_true/u; the gate keeps them so
    * the oracle pins the mechanism end-to-end (same u, same z, same
    * clamped count), and the certificate independently re-derives every
    * z and checks the mechanism's pmf against the analytic distribution.
    *
    * Scale: noise applies AFTER aggregation — the corpus pays one
    * map-side-combinable rollup (the q271 Expand shape); the mechanism
    * itself touches |groups| rows with literal-array arithmetic. At
    * 100 TB the release cost is the aggregate it decorates.
    */
  private val q319 = Q("q319_dp_noisy_counts",
    (s, d) => {
      val g = Tables.fanOut(Tables.events(s, d))
        .withColumn("day", date_format(col("ts_utc"), "yyyy-MM-dd"))
        .rollup("event_type", "day")
        .agg(count(lit(1)).as("n_true"), grouping_id().cast("long").as("gid"))
        .filter(col("gid") < 3)
        .select(col("event_type"), coalesce(col("day"), lit("*")).as("day"),
          col("gid"), col("n_true"))
      g.withColumn("u",
          GeomMechanism.uniform(concat(lit("dp:"), col("gid").cast("string"),
            lit(":"), col("event_type"), lit(":"), col("day"))))
        .withColumn("z", GeomMechanism.draw(col("u")))
        .withColumn("n_noisy", greatest(lit(0L), col("n_true") + col("z")))
        .withColumn("eps", lit(GeomMechanism.epsNode))
        .withColumn("eps_total", lit(2 * GeomMechanism.epsNode))
        .orderBy("gid", "event_type", "day")
    },
    Some {
      val keyMd5 =
        "md5('dp:' || CAST(gid AS VARCHAR) || ':' || event_type || ':' || day)"
      s"""WITH e AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day
          FROM events),
        g AS (SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS n_true,
            CAST(GROUPING(event_type) * 2 + GROUPING(day) AS BIGINT) AS gid
          FROM e GROUP BY ROLLUP (event_type, day)),
        f AS (SELECT event_type, COALESCE(day, '*') AS day, gid, n_true
          FROM g WHERE gid < 3),
        h AS (SELECT *, ${GeomMechanism.duckUniform(keyMd5)} AS u FROM f),
        n AS (SELECT *, ${GeomMechanism.duckDraw("u")} AS z FROM h)
      SELECT event_type, day, gid, n_true, u, z,
        CAST(greatest(0, n_true + z) AS BIGINT) AS n_noisy,
        0.5::DOUBLE AS eps, 1.0::DOUBLE AS eps_total
      FROM n ORDER BY gid, event_type, day"""
    })

  /** ε-DP release of a RUNNING count — Chan–Shi–Song / Dwork et al.'s
    * continual-observation binary (dyadic-tree) mechanism, the privacy
    * primitive for live telemetry: publishing the cumulative event count
    * after every interval with fresh q319-style noise per release costs
    * ε·T; adding noise once per DYADIC NODE and assembling each prefix
    * from its ≤⌈log₂T⌉+1 set-bit segments costs each item only
    * ε_node·levels and keeps the per-release error O(log^{1.5} T).
    * Dataflow: one corpus aggregate buckets events into observed hours
    * (dense index t = 1..T); everything after runs on metadata-scale
    * frames — node sums s(l,j) = Σ c over [(j−1)·2ˡ+1 .. j·2ˡ] via a
    * 21-level explode + re-aggregate, per-node noise from the shared
    * [[GeomMechanism]] keyed 'dpc:l:j', and release R(t) = Σ over t's
    * set bits of (s + z) at node (l, (t≫(l+1))·2+1) — pure integer
    * shift/mask arithmetic both engines evaluate identically. Output
    * keeps the true prefix and err = R − C (the ledger a release audit
    * wants; a production release drops them) plus the triangle-inequality
    * bound n_nodes·B the certificate re-checks, and eps_item =
    * ε_node·levels — each bucket lands in exactly one node per level, so
    * the composition ledger is exact, not a bound.
    *
    * Scale: the corpus pays one map-combinable groupBy(hour); the tree
    * (≈2T nodes) and the decomposition join are |T|-row frames, and T
    * itself is a 1-row collect off the checkpointed spine (the q303
    * scalar class). At 100 TB of events the release costs the hour
    * census it decorates.
    */
  private val q321 = Q("q321_dp_continual_counter",
    (s, d) => {
      val hours = Tables.fanOut(Tables.events(s, d))
        .groupBy(date_format(col("ts_utc"), "yyyy-MM-dd HH").as("hour"))
        .agg(count(lit(1)).as("c"))
      val wT = Window.orderBy("hour")
      // |hours| rows; pinned so the node/decomposition/prefix branches
      // below never re-run the corpus aggregate (the q317 device)
      val buckets = hours
        .withColumn("t", row_number().over(wT).cast("long"))
        .localCheckpoint()
      // T and the level spine are KB-scale scalars off the checkpointed
      // frame (the q303 two-scalar-collect class): deriving them as live
      // lineage instead planned two 1-row broadcast crossJoins plus a
      // countDistinct aggregate — six extra stages of pure machinery on
      // a |T|-row dataflow (profiled: the fixed floor dropped ~40 %)
      val tMax = buckets.agg(max("t")).collect()(0).getLong(0)
      val levels = (0 to 62).filter(l => (1L << l) <= tMax)
      val levelSpine = explode(typedLit(levels)).as("l")
      val nodes = buckets.select(col("t"), col("c"), levelSpine)
        .withColumn("j", expr("shiftright(t - 1, l) + 1"))
        .groupBy("l", "j").agg(sum("c").as("s"))
        .withColumn("u", GeomMechanism.uniform(concat(lit("dpc:"),
          col("l").cast("string"), lit(":"), col("j").cast("string"))))
        .withColumn("z", GeomMechanism.draw(col("u")))
      val decomp = buckets.select(col("t"), levelSpine)
        .filter(expr("(shiftright(t, l) & 1) = 1"))
        .withColumn("j", expr("shiftright(t, l + 1) * 2 + 1"))
      val released = decomp.join(nodes, Seq("l", "j"))
        .groupBy("t").agg(sum(col("s") + col("z")).as("released"),
          count(lit(1)).cast("long").as("n_nodes"))
      val wPfx = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
      val truth = buckets
        .withColumn("c_prefix", sum(col("c")).over(wPfx))
      released.join(truth, "t")
        .select(col("t"), col("hour"), col("c").as("c_bucket"), col("c_prefix"),
          col("released"), (col("released") - col("c_prefix")).as("err"),
          col("n_nodes"),
          (col("n_nodes") * GeomMechanism.B).cast("long").as("err_bound"),
          lit(GeomMechanism.epsNode).as("eps_node"),
          lit(GeomMechanism.epsNode * levels.size).as("eps_item"))
        .orderBy("t")
    },
    Some {
      val nodeKey = "md5('dpc:' || CAST(l AS VARCHAR) || ':' || CAST(j AS VARCHAR))"
      s"""WITH h AS (SELECT strftime(ts, '%Y-%m-%d %H') AS hour,
            CAST(COUNT(*) AS BIGINT) AS c
          FROM events GROUP BY 1),
        b AS (SELECT hour, c,
            CAST(row_number() OVER (ORDER BY hour) AS BIGINT) AS t FROM h),
        tm AS (SELECT MAX(t) AS tmax FROM b),
        lv AS (SELECT l FROM range(0, 21) r(l)),
        n0 AS (SELECT l, ((t - 1) >> l) + 1 AS j, CAST(SUM(c) AS BIGINT) AS s
          FROM b CROSS JOIN lv CROSS JOIN tm
          WHERE (CAST(1 AS BIGINT) << l) <= tmax GROUP BY 1, 2),
        nd AS (SELECT l, j, s, ${GeomMechanism.duckDraw(
            GeomMechanism.duckUniform(nodeKey))} AS z FROM n0),
        nl AS (SELECT CAST(COUNT(DISTINCT l) AS BIGINT) AS n_levels FROM nd),
        dc AS (SELECT t, l, (t >> (l + 1)) * 2 + 1 AS j
          FROM b CROSS JOIN lv WHERE ((t >> l) & 1) = 1),
        rl AS (SELECT t, CAST(SUM(s + z) AS BIGINT) AS released,
            CAST(COUNT(*) AS BIGINT) AS n_nodes
          FROM dc JOIN nd USING (l, j) GROUP BY t),
        tr AS (SELECT t, hour, c,
            CAST(SUM(c) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
              AND CURRENT ROW) AS BIGINT) AS c_prefix FROM b)
      SELECT t, tr.hour, tr.c AS c_bucket, c_prefix, released,
        CAST(released - c_prefix AS BIGINT) AS err, n_nodes,
        CAST(n_nodes * ${GeomMechanism.B} AS BIGINT) AS err_bound,
        0.5::DOUBLE AS eps_node,
        0.5::DOUBLE * CAST(n_levels AS DOUBLE) AS eps_item
      FROM rl JOIN tr USING (t) CROSS JOIN nl ORDER BY t"""
    })

  override val all: Seq[Q] = Seq(q212, q213, q214, q215, q233, q273, q274,
    q277, q306, q308, q310, q312, q319, q321)
}
