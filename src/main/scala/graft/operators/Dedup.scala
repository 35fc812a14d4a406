package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard.
  *
  * Scale design:
  *  - signatures (minhash/simhash/fingerprints) are per-row higher-order-
  *    function expressions — computed at scan speed, no shuffle, no UDF;
  *  - candidate generation shuffles only (band_hash → doc_id) pairs, never
  *    documents;
  *  - verification joins operate on pre-shrunk candidate sets.
  *
  * Hashes are salted md5 hex strings (lexicographic min == numeric min on
  * a uniform hash), chosen so an external SQL engine reproduces them
  * bit-for-bit for the correctness oracle.
  */
object Dedup {

  /** Exact dedup: group by content hash; keep the smallest doc_id as the
    * canonical representative. One shuffle of (hash, doc_id) pairs only.
    */
  def exactGroups(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  /** MinHash signature: `numHashes` hash functions derived from
    * ceil(numHashes/3) salted md5s per shingle — each md5's 32 hex chars
    * yield three independent 40-bit keys (10-hex-char slices), cutting the
    * md5 work 3× vs one digest per hash function. A 40-bit key space is
    * ample for minhash ordering (collisions need ~2^20 shingles per doc).
    * Per-row HOF computation, shuffle-free.
    */
  def minhashCols(shingles: Column, numHashes: Int): Seq[Column] =
    (0 until numHashes).map { i =>
      val salt = i / 3
      val slice = i % 3
      array_min(transform(shingles,
        x => substring(md5(concat(lit(s"$salt:"), x)), 1 + slice * 10, 10)))
        .as(s"mh$i")
    }

  /** All `numHashes` minhash minima as ONE array column via the native
    * [[graft.functions.MinHashSigs]] expression — identical values to
    * [[minhashCols]] (a spec asserts it), one pass, ~3x less md5.
    */
  def minhashArray(shingles: Column, numHashes: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.MinHashSigs(
      ColumnBridge.expression(shingles), numHashes))
  }

  /** mh0..mhN-1 projections over a [[minhashArray]] column. */
  def minhashColsFromArray(arr: Column, numHashes: Int): Seq[Column] =
    (0 until numHashes).map(i => element_at(arr, i + 1).as(s"mh$i"))

  /** LSH banding: group `numHashes` signature columns into bands of
    * `rowsPerBand`, hash each band. Docs sharing any band hash are
    * candidate near-duplicates.
    */
  def bandCols(numHashes: Int, rowsPerBand: Int): Seq[Column] = {
    (0 until numHashes / rowsPerBand).map { b =>
      val parts = (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}"))
      md5(concat_ws("|", parts: _*)).as(s"band$b")
    }
  }

  /** Candidate pairs via LSH: explode bands, self-join per (band index,
    * band hash) bucket, emit distinct ordered pairs. The join input is
    * |docs|×|bands| small rows; the quadratic blowup is confined to within
    * buckets (the point of LSH).
    */
  def lshCandidatePairs(sigs: DataFrame, numBands: Int): DataFrame = {
    val bandStructs = array((0 until numBands).map(b =>
      struct(lit(b).as("band_idx"), col(s"band$b").as("band_hash"))): _*)
    val exploded = sigs
      .select(col("doc_id"), explode(bandStructs).as("b"))
      .select(col("doc_id"), col("b.band_idx"), col("b.band_hash"))
    val a = exploded.as("a")
    val b = exploded.as("b")
    a.join(b,
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_id_a"), col("b.doc_id").as("doc_id_b"))
      .distinct()
  }

  /** 32-bit integer from the first 8 hex chars of a digest string, decoded
    * arithmetically ('a'..'f' → 10..15, '0'..'9' → 0..9). Apply to a
    * md5-hex lambda variable so the digest is computed once per token.
    */
  def hexHash32(hexStr: Column): Column = {
    def nibble(pos: Int): Column = {
      val c = ascii(substring(hexStr, pos, 1)).cast("long")
      when(c >= 97, c - 87).otherwise(c - 48)
    }
    (1 to 8).map(p => shiftleft(nibble(p), (8 - p) * 4)).reduce(_ + _)
  }

  /** All token hashes as one array column via the native
    * [[graft.functions.TokenHash32]] expression — identical values to
    * `hexHash32(md5(token))` per token (spec-asserted). Use behind an
    * explode barrier when feeding [[simhash32]], whose 32 per-bit
    * aggregates each reference the array.
    */
  def tokenHash32Array(tokens: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.TokenHash32(
      ColumnBridge.expression(tokens)))
  }

  /** 32-bit SimHash over a pre-hashed token array (`tok_hash`, from
    * [[tokenHash32Array]] or the declarative hexHash32∘md5 chain): for
    * each bit position, sum ±1 votes; the sign of the sum sets the bit.
    * Integer arithmetic only — bit-exact everywhere — and per-row
    * (shuffle-free).
    */
  def simhash32(tokHash: Column): Column = {
    val bits = (0 until 32).map { b =>
      val sumVotes = aggregate(tokHash, lit(0L), (acc, h) =>
        acc + shiftright(h, b).bitwiseAND(lit(1L)) * 2L - 1L)
      when(sumVotes > 0, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Hamming distance between two simhash values (for near-dup banding /
    * verification).
    */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** n-gram Jaccard similarity between two shingle arrays (distinct
    * semantics): |A∩B| / |A∪B|.
    */
  def jaccard(shA: Column, shB: Column): Column =
    size(array_intersect(shA, shB)).cast("double") /
      size(array_union(shA, shB))

  /** Streaming exact dedup: drop events whose content hash was already
    * seen, with state bounded by the watermark horizon (idiomatic
    * Structured Streaming dedup — state is GC'd once the event-time
    * watermark passes).
    *
    * @param eventTimeCol TimestampType column the watermark rides on
    */
  def streamingExact(events: DataFrame, textCol: String,
      eventTimeCol: String, watermarkDelay: String): DataFrame =
    events
      .withColumn("content_hash", md5(col(textCol)))
      .withWatermark(eventTimeCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Duplicate-cluster resolution: connected components over the LSH
    * candidate-pair graph via iterative min-label propagation — each doc's
    * cluster id becomes the smallest doc_id in its component (the
    * canonical representative to keep).
    *
    * Scale: the standard pre-GraphFrames distributed CC — per iteration
    * one join + one aggregation on the edge list, converging in
    * O(component diameter) rounds (near-dup clusters are shallow);
    * `localCheckpoint` truncates lineage so plans don't grow with
    * iterations.
    */
  def duplicateClusters(pairs: DataFrame): DataFrame = {
    val edges = pairs
      .select(col("doc_id_a").as("src"), col("doc_id_b").as("dst"))
      .unionByName(pairs.select(col("doc_id_b").as("src"), col("doc_id_a").as("dst")))
      .localCheckpoint()
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("cluster_id", col("doc_id"))
      .localCheckpoint()
    var converged = false
    while (!converged) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("doc_id", "nbr"),
          col("dst") === col("nbr"))
        .groupBy(col("src")).agg(min(col("cluster_id")).as("nbr_min"))
      // Carry the old label through the update so convergence detection is
      // a filter over the (already materialized) checkpoint — no extra
      // join+shuffle per iteration. Labels only ever decrease (least), so
      // changed ⇔ new < old.
      val updated = labels
        .join(neighborMin, labels("doc_id") === neighborMin("src"), "left")
        .select(col("doc_id"), col("cluster_id").as("old_id"),
          least(col("cluster_id"), coalesce(col("nbr_min"), col("cluster_id")))
            .as("cluster_id"))
        .localCheckpoint()
      val changed = updated.filter(col("cluster_id") < col("old_id")).limit(1).count()
      labels = updated.select("doc_id", "cluster_id")
      converged = changed == 0
      if (sys.env.contains("GRAFT_CC_DEBUG")) System.err.println(s"[cc] iteration changed=$changed")
    }
    labels
  }
}
