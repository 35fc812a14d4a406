package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Dedup, GraphOps}

/** Round-8 frontier surface: iterative graph primitives beyond PageRank /
  * triangles (label propagation, k-core peeling), KMV/theta-style distinct
  * sketch set operations, and further training-data-pipeline operators.
  * Same contract as every other registry: each Q is one operator family
  * with a full DuckDB oracle.
  */
object FrontierQueries extends Registry {

  /** The symmetrized customer↔supplier trade graph of q116 (distinct
    * (o_custkey, l_suppkey) pairs via the orderkey join; node ids
    * namespaced 2k / 2k+1). Because the two namespaces are disjoint the
    * symmetrization is a plain UNION ALL — no dedup shuffle. Degrees at
    * sf0.01 span 3..538, so both label spread and core peeling
    * discriminate (unlike the support-thresholded co-supply graph, which
    * is a uniform clique below sf0.1).
    */
  private[queries] def tradeGraph(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
    val l = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
    val raw = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    raw.unionByName(raw.select(col("dst").as("src"), col("src").as("dst")))
  }

  private val tradeGraphSql: String =
    """eraw AS (
        SELECT DISTINCT o_custkey*2 AS src, l_suppkey*2+1 AS dst
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      e AS (SELECT src, dst FROM eraw UNION ALL SELECT dst, src FROM eraw)"""

  /** Synchronous min-label propagation, 3 rounds
    * ([[GraphOps.labelPropagationMin]]): after round k each node carries
    * the smallest node id within distance ≤ k — the deterministic core of
    * community/component detection (Raghavan et al. 2007's propagation
    * schedule made order-independent by the MIN combiner, the same
    * message+combine superstep as Pregel). Integer MIN has no tie-break
    * or accumulation-order ambiguity, so the iterative-BSP family gets a
    * full hash oracle: the SQL unrolls the identical recurrence. At
    * 100 TB the per-round join runs on edge/label tables bucketed by node
    * id (shuffle-free supersteps); labels are never broadcast or
    * collected.
    */
  private val q165 = Q("q165_label_propagation",
    (s, d) => {
      GraphOps.labelPropagationMin(tradeGraph(s, d), 3)
        .orderBy("node")
    },
    Some {
      val rounds = (1 to 3).map { i =>
        s"""l$i AS (SELECT node, MIN(lbl) AS lbl FROM (
            SELECT e.dst AS node, p.lbl FROM e JOIN l${i - 1} p ON p.node = e.src
            UNION ALL SELECT node, lbl FROM l${i - 1}) GROUP BY node)"""
      }.mkString(",\n      ")
      s"""WITH $tradeGraphSql,
      n AS (SELECT DISTINCT src AS node FROM e),
      l0 AS (SELECT node, node AS lbl FROM n),
      $rounds
      SELECT node, lbl FROM l3 ORDER BY node"""
    })

  /** k-core peeling, k = 30, 3 fixed rounds ([[GraphOps.kCorePeel]]):
    * each round drops nodes of degree < 30 and restricts edges to
    * survivors — the standard dense-subgraph / spam-hub extraction
    * primitive (Seidman 1983; distributed peeling as in Montresor et
    * al.). A fixed round count keeps the result deterministic and the
    * oracle unrollable; production iterates the same dataflow to
    * fixpoint. Output = surviving nodes with their degree in the final
    * restricted edge set. At sf0.01 round 1 drops roughly the lower
    * half of the degree distribution (median 33), so the peel genuinely
    * cascades.
    */
  private val q166 = Q("q166_kcore_peel",
    (s, d) => {
      GraphOps.kCorePeel(tradeGraph(s, d), 30, 3)
        .orderBy("node")
    },
    Some {
      val rounds = (1 to 3).map { i =>
        s"""a$i AS (SELECT src AS v FROM e${i - 1} GROUP BY src HAVING COUNT(*) >= 30),
        e$i AS (SELECT x.src, x.dst FROM e${i - 1} x
          JOIN a$i sa ON x.src = sa.v JOIN a$i ta ON x.dst = ta.v)"""
      }.mkString(",\n      ")
      s"""WITH $tradeGraphSql,
      e0 AS (SELECT src, dst FROM e),
      $rounds
      SELECT src AS node, COUNT(*) AS deg FROM e3 GROUP BY src ORDER BY node"""
    })

  /** KMV/theta-sketch set operations ([[graft.functions.KmvSketchAgg]],
    * k = 256) over per-event-type ACTIVE-USER-DAY sets (key =
    * user_id·100000 + day-of-year): for every unordered pair of event
    * types, estimate |A∪B| (k smallest of the merged sketches — computed
    * HERE with Catalyst array HOFs: `array_union`/`array_sort`/`slice`)
    * and |A∩B| (matching hashes under the union threshold → Jaccard ×
    * union). The gate follows the q157/q161 pattern for approximate
    * operators: exact cardinalities are full hash-matched columns and
    * the estimates are asserted INSIDE their theoretical error bounds
    * (≈5σ at 1/√(k−2) ≈ 6.3% relative error) as boolean columns the
    * oracle pins to TRUE — falsifiable for any broken sketch, robust to
    * the estimator's deterministic-but-approximate value.
    *
    * Scale: this is the audience-overlap / cross-corpus-contamination
    * shape. The EXACT pairwise path (the oracle, and the exact columns
    * here) needs a distinct + self-join on the key stream — the thing
    * that dies first at 100 TB. The sketch path aggregates each group
    * once with map-side partial merge (≤ k longs per group per
    * partition) and does all pairwise algebra on k-sized arrays — at
    * production scale the exact columns drop out and P pairwise overlaps
    * cost one scan + P·O(k) array merges.
    */
  private val q167 = Q("q167_kmv_theta_setops",
    (s, d) => {
      val k = 256
      val kmv = udaf(new graft.functions.KmvSketchAgg(k))
      val keys = Tables.events(s, d)
        .select(col("event_type"),
          (col("user_id") * 100000L + dayofyear(col("ts_utc"))).as("key"))
        .distinct()
      val sk = keys
        .groupBy("event_type")
        .agg(kmv(xxhash64(col("key"))).as("sk"),
          count(lit(1)).as("n")) // keys is distinct ⇒ exact cardinality
        .localCheckpoint() // tiny (one row per type); cut for the self-joins
      val inter = keys.as("x").join(keys.as("y"),
          col("x.key") === col("y.key") &&
          col("x.event_type") < col("y.event_type"))
        .groupBy(col("x.event_type").as("ta"), col("y.event_type").as("tb"))
        .agg(count(lit(1)).as("n_inter"))
      val pairs = sk.as("a").join(sk.as("b"),
          col("a.event_type") < col("b.event_type"))
        .join(inter,
          col("a.event_type") === col("ta") && col("b.event_type") === col("tb"),
          "left")
      val u = slice(array_sort(array_union(col("a.sk"), col("b.sk"))), 1, k)
      val kk = size(u) // < k ⇔ both sketches complete ⇒ union is exact
      val estUnion = when(kk < k, kk.cast("double"))
        .otherwise(lit((k - 1).toDouble) * lit(9.223372036854776e18) /
          element_at(u, k).cast("double"))
      val matching = size(array_intersect(array_intersect(u, col("a.sk")), col("b.sk")))
      val estInter = matching.cast("double") / kk.cast("double") * estUnion
      val nUnion = (col("a.n") + col("b.n") - coalesce(col("n_inter"), lit(0L)))
      pairs.select(
          col("a.event_type").as("type_a"), col("b.event_type").as("type_b"),
          col("a.n").as("n_a"), col("b.n").as("n_b"),
          nUnion.as("n_union"), coalesce(col("n_inter"), lit(0L)).as("n_inter"),
          (abs(estUnion - nUnion.cast("double")) <=
            lit(0.32) * nUnion.cast("double")).as("union_ok"),
          (abs(estInter - coalesce(col("n_inter"), lit(0L)).cast("double")) <=
            lit(0.25) * nUnion.cast("double")).as("inter_ok"))
        .orderBy("type_a", "type_b")
    },
    Some("""WITH keys AS (
        SELECT DISTINCT event_type, user_id*100000 + date_part('doy', ts) AS key
        FROM events),
      c AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM keys GROUP BY event_type),
      i AS (SELECT a.event_type AS ta, b.event_type AS tb,
          CAST(COUNT(*) AS BIGINT) AS n_inter
        FROM keys a JOIN keys b
          ON a.key = b.key AND a.event_type < b.event_type
        GROUP BY ta, tb)
      SELECT ca.event_type AS type_a, cb.event_type AS type_b,
        ca.n AS n_a, cb.n AS n_b,
        ca.n + cb.n - COALESCE(i.n_inter, 0) AS n_union,
        COALESCE(i.n_inter, 0) AS n_inter,
        TRUE AS union_ok, TRUE AS inter_ok
      FROM c ca JOIN c cb ON ca.event_type < cb.event_type
      LEFT JOIN i ON i.ta = ca.event_type AND i.tb = cb.event_type
      ORDER BY type_a, type_b"""))

  /** Video frame sampling through a REAL container parse
    * ([[graft.operators.Multimodal.VideoCodec]]): synthesize a GVID
    * binary per document (magic + u16 header + N gray planes), compute
    * the frame-sample plan at the PLAN level (every 2nd frame, max 4 —
    * pure array arithmetic on declared metadata,
    * [[Multimodal.withFrameSamplePlan]]), then demux/decode ONLY the
    * sampled planes per partition. The oracle recomputes each sampled
    * frame's closed-form pixel sum, so any header, offset, or
    * plan-to-decoder mismatch fails the hash gate. Completes the
    * multimodal decode seam: image (q107 real PNG), RGB (q112), audio
    * (q146 real WAV), video frame-sample (here).
    *
    * Scale: sampling is decided from metadata BEFORE any byte is
    * touched, so at 100 TB the decoder reads |sampled frames| · plane
    * bytes, never whole payloads; decode is per-partition batch work
    * with no shuffle (scan → narrow map), and the output is KB-sized
    * features per asset.
    */
  private val q168 = Q("q168_video_frame_sample",
    (s, d) => {
      val media = graft.operators.Multimodal
        .synthesizeVideos(Tables.fanOut(Tables.documents(s, d)))
      val planned = graft.operators.Multimodal
        .withFrameSamplePlan(media, "declared_frames", stride = 2, maxFrames = 4)
      graft.operators.Multimodal.decodeVideoFrames(planned).orderBy("doc_id")
    },
    Some("""WITH dims AS (SELECT doc_id,
        CAST(doc_id % 17 + 16 AS INTEGER) AS w,
        CAST(doc_id % 13 + 16 AS INTEGER) AS h,
        CAST(doc_id % 9 + 4 AS INTEGER) AS nf
      FROM documents),
      fr AS (SELECT doc_id, w, h, nf, CAST(f.i AS INTEGER) AS fi
        FROM dims, range(0, 12, 2) f(i) WHERE f.i < nf AND f.i < 8),
      px AS (SELECT fr.doc_id, fr.fi,
          SUM((7*x.i + 13*y.i + 31*fr.fi + 11*fr.doc_id) % 251) AS s
        FROM fr, range(0, 33) x(i), range(0, 29) y(i)
        WHERE x.i < fr.w AND y.i < fr.h
        GROUP BY fr.doc_id, fr.fi)
      SELECT d.doc_id, d.w AS width, d.h AS height, d.nf AS n_frames,
        CAST(COUNT(px.fi) AS INTEGER) AS n_sampled,
        CAST(10 + d.w*d.h*d.nf AS BIGINT) AS byte_len,
        CAST(SUM(px.s) AS BIGINT) AS sampled_pix_sum
      FROM dims d JOIN px ON px.doc_id = d.doc_id
      GROUP BY d.doc_id, d.w, d.h, d.nf
      ORDER BY d.doc_id"""))

  /** Content-defined chunking ([[graft.operators.TextAnalysis.cdcChunkEnds]],
    * w = 8, P(boundary) = 1/16): per document, the chunk-end positions
    * from the sliding-window hash rule plus the document end, reduced to
    * chunk count / max chunk length / boundary checksum. CDC is the
    * splitter under chunk-level dedup (LBFS/Muthitacharoen 2001, gear-CDC
    * FastCDC 2016): boundaries depend only on local content, so edits
    * resynchronize within one window instead of shifting every downstream
    * chunk — which is why dedup at 100 TB chunks THIS way and then
    * hash-groups chunk fingerprints (q20's exact-dedup shape, one level
    * down). Whole pipeline is scan-local HOFs: zero shuffle until the
    * final per-doc aggregate, which is itself embarrassingly parallel.
    */
  private val q169 = Q("q169_cdc_chunking",
    (s, d) => {
      val w = 8
      Tables.fanOut(Tables.documents(s, d))
        .withColumn("ends",
          graft.operators.TextAnalysis.cdcChunkEnds(col("text"), w))
        // document end closes the final chunk unless already a boundary
        .withColumn("ends", when(
            size(col("ends")) > 0 &&
              element_at(col("ends"), -1) === length(col("text")),
            col("ends"))
          .otherwise(concat(col("ends"), array(length(col("text"))))))
        .select(col("doc_id"),
          size(col("ends")).as("n_chunks"),
          array_max(zip_with(col("ends"),
            concat(array(lit(0)), slice(col("ends"), lit(1), size(col("ends")) - 1)),
            (e, st) => e - st)).as("max_chunk"),
          aggregate(col("ends"), lit(0L), (acc, x) => acc + x)
            .as("boundary_sum"))
        .orderBy("doc_id")
    },
    Some("""WITH pos AS (
        SELECT doc_id, text, len(text) AS n, unnest(range(8, len(text)+1)) AS i
        FROM documents),
      b AS (SELECT doc_id, CAST(i AS INTEGER) AS i FROM pos
        WHERE substr(md5(substr(text, CAST(i-7 AS INTEGER), 8)), 32, 1) = '0'),
      ends AS (SELECT doc_id, i FROM b
        UNION SELECT doc_id, CAST(len(text) AS INTEGER) FROM documents),
      lens AS (SELECT doc_id, i,
          i - COALESCE(LAG(i) OVER (PARTITION BY doc_id ORDER BY i), 0) AS l
        FROM ends)
      SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_chunks,
        CAST(MAX(l) AS INTEGER) AS max_chunk,
        CAST(SUM(i) AS BIGINT) AS boundary_sum
      FROM lens GROUP BY doc_id ORDER BY doc_id"""))

  /** Cluster-aware train/val/test split: assign every document to a
    * split by hashing its NEAR-DUP CLUSTER id (q38's LSH connected
    * components; singletons are their own cluster), not its doc id —
    * the discipline that keeps near-duplicates of a validation document
    * out of the training set (the eval-leakage failure mode of
    * benchmark-contaminated corpora). The output quantifies exactly
    * that: per-split doc/cluster counts, plus two leakage counters over
    * the LSH candidate pairs — `leak_pairs_doc_split` (what naive
    * per-doc hashing would leak, a nonzero fixture-determined number)
    * vs `leak_pairs_cluster_split` (the cluster-aware assignment,
    * structurally 0 since the split is a function of the cluster id).
    * Split hash = first 8 md5 nibbles of "split:"||cluster_id against
    * integer thresholds 0.8·2³² / 0.9·2³² — the repo's standard
    * engine-portable deterministic draw (q43/q53), no floating point.
    *
    * Scale: clusters come from the LSH + large-star/small-star CC path
    * (never all-pairs); the assignment is a broadcast-sized left join
    * only because multi-doc clusters are rare — at 100 TB it is a
    * key-partitioned join on doc_id, and the split draw itself is
    * scan-local hashing, retry-stable under speculative execution.
    */
  private val q170 = Q("q170_cluster_aware_split",
    (s, d) => {
      val trainMax = 3435973836L // floor(0.8 * 2^32)
      val valMax = 3865470566L   // floor(0.9 * 2^32)
      def splitOf(c: Column): Column = {
        val h = Dedup.hexHash32(md5(concat(lit("split:"), c.cast("string"))))
        when(h < trainMax, "train").when(h < valMax, "val").otherwise("test")
      }
      val pairs = TrainingDataQueries.lshPairsFrame(s, d).localCheckpoint()
      val clusters = Dedup.duplicateClusters(pairs)
      val sp = Tables.fanOut(Tables.documents(s, d)).select(col("doc_id"))
        .join(clusters, Seq("doc_id"), "left")
        .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
        .withColumn("split", splitOf(col("cluster_id")))
        .withColumn("split_doc", splitOf(col("doc_id")))
        .localCheckpoint() // consumed twice (summary + leak join)
      val leak = pairs
        .join(sp.select(col("doc_id").as("doc_id_a"), col("split").as("sa"),
          col("split_doc").as("sda")), "doc_id_a")
        .join(sp.select(col("doc_id").as("doc_id_b"), col("split").as("sb"),
          col("split_doc").as("sdb")), "doc_id_b")
        .agg(
          coalesce(sum(when(col("sda") =!= col("sdb"), 1L).otherwise(0L)), lit(0L))
            .as("leak_pairs_doc_split"),
          coalesce(sum(when(col("sa") =!= col("sb"), 1L).otherwise(0L)), lit(0L))
            .as("leak_pairs_cluster_split"))
      sp.groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("cluster_id")).as("n_clusters"))
        .crossJoin(leak) // 1-row leak scalar
        .orderBy("split")
    },
    Some(s"""WITH RECURSIVE ${TrainingDataQueries.duckLshPairsCtes},
      edges AS (
        SELECT doc_id_a AS src, doc_id_b AS dst FROM pairs
        UNION ALL SELECT doc_id_b, doc_id_a FROM pairs),
      reach(doc_id, lbl) AS (
        SELECT DISTINCT src, src FROM edges
        UNION
        SELECT e.src, r.lbl FROM edges e JOIN reach r ON r.doc_id = e.dst),
      cl AS (SELECT doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY doc_id),
      sp AS (SELECT d.doc_id, COALESCE(cl.cluster_id, d.doc_id) AS cluster_id,
          CASE WHEN ${TrainingDataQueries.duckHash32("md5('split:' || CAST(COALESCE(cl.cluster_id, d.doc_id) AS VARCHAR))")} < 3435973836
            THEN 'train'
            WHEN ${TrainingDataQueries.duckHash32("md5('split:' || CAST(COALESCE(cl.cluster_id, d.doc_id) AS VARCHAR))")} < 3865470566
            THEN 'val' ELSE 'test' END AS split,
          CASE WHEN ${TrainingDataQueries.duckHash32("md5('split:' || CAST(d.doc_id AS VARCHAR))")} < 3435973836
            THEN 'train'
            WHEN ${TrainingDataQueries.duckHash32("md5('split:' || CAST(d.doc_id AS VARCHAR))")} < 3865470566
            THEN 'val' ELSE 'test' END AS split_doc
        FROM documents d LEFT JOIN cl USING (doc_id)),
      leak AS (SELECT
          CAST(COALESCE(SUM(CASE WHEN sa.split_doc <> sb.split_doc THEN 1 ELSE 0 END), 0) AS BIGINT)
            AS leak_pairs_doc_split,
          CAST(COALESCE(SUM(CASE WHEN sa.split <> sb.split THEN 1 ELSE 0 END), 0) AS BIGINT)
            AS leak_pairs_cluster_split
        FROM pairs p
        JOIN sp sa ON sa.doc_id = p.doc_id_a
        JOIN sp sb ON sb.doc_id = p.doc_id_b)
      SELECT sp.split, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(COUNT(DISTINCT sp.cluster_id) AS BIGINT) AS n_clusters,
        leak.leak_pairs_doc_split, leak.leak_pairs_cluster_split
      FROM sp, leak
      GROUP BY sp.split, leak.leak_pairs_doc_split, leak.leak_pairs_cluster_split
      ORDER BY sp.split"""))

  /** Per-document n-gram novelty against the id-ordered corpus prefix:
    * for each document, how many of its distinct 3-shingles (same
    * tokenization as the LSH family) does it INTRODUCE — i.e. no
    * lower-id document contains them. The novelty ratio
    * (n_novel/n_shingles) is the standard incremental-curation signal
    * for boilerplate and template detection: near-zero novelty means
    * the document's content already exists in the corpus even when no
    * single document is a near-duplicate (the case q22/q38 cannot see).
    *
    * Scale: explode → distinct → one aggregation keyed by SHINGLE (the
    * same key the decontamination ops q47/q62 shuffle on) with map-side
    * partial MIN, then one join back and a per-doc count. No all-pairs
    * term anywhere; skewed head shingles cost one combiner entry per
    * partition, not a fan-out.
    */
  private val q171 = Q("q171_ngram_novelty",
    (s, d) => {
      val sh = Tables.fanOut(Tables.documents(s, d))
        .select(col("doc_id"), explode(graft.operators.TextAnalysis
          .shingles(graft.operators.TextAnalysis.tokens(col("text")), 3)).as("g"))
        .distinct()
      val first = sh.groupBy("g").agg(min(col("doc_id")).as("first_doc"))
      val per = sh.join(first, "g")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
            .as("n_novel"))
      Tables.documents(s, d).select(col("doc_id"))
        .join(per, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
          coalesce(col("n_novel"), lit(0L)).as("n_novel"))
        .orderBy("doc_id")
    },
    Some(s"""WITH t AS (SELECT doc_id, ${TrainingDataQueries.duckToks} AS w FROM documents),
      s AS (SELECT doc_id, ${TrainingDataQueries.duckShingles("w")} AS sh FROM t),
      e AS (SELECT DISTINCT doc_id, unnest(sh) AS g FROM s),
      f AS (SELECT g, MIN(doc_id) AS first_doc FROM e GROUP BY g),
      p AS (SELECT e.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
          CAST(SUM(CASE WHEN f.first_doc = e.doc_id THEN 1 ELSE 0 END) AS BIGINT)
            AS n_novel
        FROM e JOIN f USING (g) GROUP BY e.doc_id)
      SELECT d.doc_id, COALESCE(p.n_shingles, 0) AS n_shingles,
        COALESCE(p.n_novel, 0) AS n_novel
      FROM documents d LEFT JOIN p USING (doc_id) ORDER BY doc_id"""))

  /** K-means UPDATE step (the Lloyd M-step that trains the IVF/SemDeDup
    * coarse quantizer whose assignment side q34/q65/q162 already gate):
    * assign every embedding to its nearest sampled centroid
    * ([[graft.operators.Similarity.ivfAssignCells]] — quantizer shipped
    * as literals, scan-local argmin), then recompute per-cell centroids
    * as per-dimension means in OFFSET FIXED POINT: q = ⌊(x+1)·2²⁰⌋ ≥ 0,
    * centroid_fp = Σq div n. Integer sums are accumulation-order-free
    * and the non-negative offset makes truncating and flooring division
    * agree, so the iterative-refinement step is bit-exact on any
    * partitioning and carries a full hash oracle — same fixed-point
    * device as q116's PageRank.
    *
    * Scale: the update is one shuffle of (cell, dim) partial sums —
    * map-side combine reduces each partition to ≤ nlist·dim rows before
    * the exchange, the textbook distributed-Lloyd round. The new
    * centroid table is nlist·dim rows: KB-sized, collected into the
    * next round's literals exactly like the initial quantizer.
    */
  private val q172 = Q("q172_kmeans_update",
    (s, d) => {
      val e = Tables.fanOut(Tables.embeddings(s, d))
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      graft.operators.Similarity.ivfAssignCells(e, nlist = 16)
        .select(col("cell"),
          posexplode(col("vec").cast("array<double>")).as(Seq("dim", "x")))
        .groupBy("cell", "dim")
        .agg(count(lit(1)).as("n"),
          sum(floor((col("x") + lit(1.0)) * lit(1048576.0)).cast("long")).as("sfp"))
        .select(col("cell"), col("dim").cast("int").as("dim"), col("n"),
          expr("sfp div n").as("centroid_fp"))
        .orderBy("cell", "dim")
    },
    Some(s"""WITH n AS (SELECT greatest(COUNT(*) // 16, 1) AS step FROM embeddings),
      cents AS (
        SELECT CAST(vec_id // step AS INTEGER) AS cell, embedding AS centroid
        FROM embeddings, n WHERE vec_id % step = 0 AND vec_id // step < 16),
      asg AS (
        SELECT id, vec, cell FROM (
          SELECT c.vec_id AS id, c.embedding AS vec, ct.cell,
            row_number() OVER (PARTITION BY c.vec_id
              ORDER BY ${TrainingDataQueries.duckSqDist("c.embedding", "ct.centroid")}, ct.cell) AS arank
          FROM embeddings c CROSS JOIN cents ct)
        WHERE arank = 1),
      x AS (SELECT cell, CAST(u.i AS INTEGER) AS dim,
          CAST(floor((CAST(vec[CAST(u.i+1 AS INTEGER)] AS DOUBLE) + 1.0) * 1048576) AS BIGINT) AS q
        FROM asg, range(0, 256) u(i) WHERE u.i < len(vec))
      SELECT cell, dim, CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(q) // COUNT(*) AS BIGINT) AS centroid_fp
      FROM x GROUP BY cell, dim ORDER BY cell, dim"""))

  /** k-center coreset by farthest-point traversal (Gonzalez 1985's
    * 2-approximation — the deterministic diverse-subset selector used
    * for coreset/probe-set construction over embedding corpora): seed
    * with vec 0, then 7 rounds of "add the point farthest from the
    * chosen set" (max–min squared distance, ties to the smallest id).
    * Output = the selection order with each pick's covering radius —
    * the radius sequence is the coreset's quality certificate (it is
    * non-increasing, and pick i's radius 2-approximates the optimal
    * (i−1)-center cost).
    *
    * Scale: each round is ONE full scan computing min-distance to ≤ k
    * literal centroids (scan-local, codegen'd VecSqDist fold) and a
    * top-1 reduce — the standard distributed k-center; k scans total,
    * no pairwise term, and the chosen set stays KB-sized literals like
    * every quantizer in this library. The per-round argmax collect is
    * the index-build action (1 row), not a data-path collect.
    */
  private val q173 = Q("q173_kcenter_coreset",
    (s, d) => {
      import graft.operators.Similarity
      val k = 8
      val e = Tables.fanOut(Tables.embeddings(s, d))
        .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec"))
        .localCheckpoint() // scanned k times; cut the scan lineage once
      def vecOf(id: Long): Array[Double] =
        e.filter(col("id") === id).select(col("vec"))
          .head().getSeq[Double](0).toArray
      var chosen = Vector((0L, vecOf(0L), 0.0))
      for (_ <- 2 to k) {
        val dCols = chosen.map(c =>
          Similarity.sqDist(col("vec"), typedLit(c._2)))
        val dmin = if (dCols.size == 1) dCols.head else least(dCols: _*)
        val pick = e.select(col("id"), dmin.as("dm"))
          .orderBy(col("dm").desc, col("id").asc).limit(1).head()
        chosen = chosen :+ ((pick.getLong(0), vecOf(pick.getLong(0)),
          pick.getDouble(1)))
      }
      val rows = chosen.zipWithIndex.map { case ((id, _, r), i) =>
        (i + 1, id, r)
      }
      s.createDataFrame(rows).toDF("rank", "id", "radius_sq")
        .orderBy("rank")
    },
    Some {
      // unrolled farthest-point rounds; ch_i = chosen set after i picks
      val rounds = (2 to 8).map { i =>
        s"""r$i AS (SELECT e.vec_id, MIN(${TrainingDataQueries.duckSqDist("e.embedding", "c.v")}) AS dm
          FROM embeddings e, ch${i - 1} c GROUP BY e.vec_id),
        p$i AS (SELECT vec_id, dm FROM r$i ORDER BY dm DESC, vec_id LIMIT 1),
        ch$i AS (SELECT id, v FROM ch${i - 1}
          UNION ALL SELECT p.vec_id, e.embedding FROM p$i p
            JOIN embeddings e ON e.vec_id = p.vec_id)"""
      }.mkString(",\n      ")
      val picks = (2 to 8).map(i =>
        s"SELECT $i AS rank, vec_id AS id, dm AS radius_sq FROM p$i")
        .mkString("\n        UNION ALL ")
      s"""WITH ch1 AS (SELECT vec_id AS id, embedding AS v FROM embeddings WHERE vec_id = 0),
      $rounds
      SELECT CAST(rank AS INTEGER) AS rank, id, radius_sq FROM (
        SELECT 1 AS rank, CAST(0 AS BIGINT) AS id, 0.0::DOUBLE AS radius_sq
        UNION ALL $picks)
      ORDER BY rank"""
    })

  /** Scalar int8 quantization of the embedding column (the compression
    * step between k-means training (q172) and PQ (q79) in an
    * embedding-store build): per-dimension global [min, max] ranges,
    * collected once as 64-double literals (the IVF-quantizer device),
    * then a scan-local HOF requantization q = clamp(⌊(x−mn)·255/(mx−mn)⌋)
    * with an index-aware `transform` lambda. Per-vector code sum,
    * position-weighted code checksum, and a reconstruction-error bound
    * (|x − x̂| ≤ cell width, x̂ = midpoint decode) are all recomputed by
    * the oracle from the same closed-form arithmetic — codes must match
    * bit-for-bit, not just statistically.
    *
    * Scale: one pass for ranges (map-side min/max partials on (dim)
    * keys, 64 rows out), one scan for codes — no shuffle of vector
    * data, no per-row joins; ranges ship as literals so quantization
    * stays inside whole-stage codegen. 4× memory cut on the ANN serving
    * path with the error certificate attached.
    */
  private val q174 = Q("q174_int8_quantize",
    (s, d) => {
      val e = Tables.fanOut(Tables.embeddings(s, d))
        .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
        .localCheckpoint() // scanned twice: range build + quantize
      val ranges = e
        .select(posexplode(col("vec")).as(Seq("dim", "x")))
        .groupBy("dim").agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
        .orderBy("dim")
        .collect().map(r => (r.getDouble(1), r.getDouble(2)))
      val mnL = typedLit(ranges.map(_._1))
      val mxL = typedLit(ranges.map(_._2))
      def mn(i: Column) = element_at(mnL, i + 1)
      def wid(i: Column) = element_at(mxL, i + 1) - element_at(mnL, i + 1)
      val codes = transform(col("vec"), (x, i) =>
        when(wid(i) === 0.0, lit(0L)).otherwise(
          least(lit(255L), greatest(lit(0L),
            floor((x - mn(i)) * lit(255.0) / wid(i))))))
      val decoded = (c: Column, i: Column) =>
        mn(i) + (c.cast("double") + lit(0.5)) * wid(i) / lit(255.0)
      e.withColumn("codes", codes)
        .select(col("vec_id"),
          aggregate(col("codes"), lit(0L), (a, c) => a + c).as("code_sum"),
          aggregate(zip_with(col("codes"),
              sequence(lit(1), size(col("codes"))), (c, i) => c * i.cast("long")),
            lit(0L), (a, v) => a + v).as("code_checksum"),
          forall(zip_with(col("vec"),
              sequence(lit(0), size(col("vec")) - 1), (x, i) =>
                abs(x - decoded(element_at(col("codes"), i + 1), i)) <=
                  wid(i) / lit(255.0) + lit(1e-12)),
            b => b).as("recon_ok"))
        .orderBy("vec_id")
    },
    Some("""WITH x AS (SELECT vec_id, CAST(u.i AS INTEGER) AS dim,
          CAST(embedding[CAST(u.i+1 AS INTEGER)] AS DOUBLE) AS x
        FROM embeddings, range(0, 256) u(i) WHERE u.i < len(embedding)),
      rg AS (SELECT dim, MIN(x) AS mn, MAX(x) AS mx FROM x GROUP BY dim),
      c AS (SELECT x.vec_id, x.dim, x.x, rg.mn, rg.mx - rg.mn AS wd,
          CASE WHEN rg.mx = rg.mn THEN 0
            ELSE least(255, greatest(0,
              CAST(floor((x.x - rg.mn) * 255.0 / (rg.mx - rg.mn)) AS BIGINT)))
          END AS q
        FROM x JOIN rg USING (dim))
      SELECT vec_id, CAST(SUM(q) AS BIGINT) AS code_sum,
        CAST(SUM(q * (dim + 1)) AS BIGINT) AS code_checksum,
        CAST(MAX(CASE WHEN abs(x - (mn + (q + 0.5) * wd / 255.0)) <=
          wd / 255.0 + 1e-12 THEN 0 ELSE 1 END) = 0 AS BOOLEAN) AS recon_ok
      FROM c GROUP BY vec_id ORDER BY vec_id"""))

  /** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    * SIGMOD 2003 — the MOSS algorithm): hash every character k-gram
    * (k = 5, the repo's engine-portable md5→32-bit hash), then in every
    * sliding window of w = 4 hashes select the minimum, ties to the
    * RIGHTMOST position; record each selected position once. The
    * guarantee (the reason winnowing beats "every i-th hash"
    * sampling): any shared substring of length ≥ k + w − 1 = 8 chars
    * produces at least one identical selected fingerprint in both
    * documents, and selection density is bounded (≈ 2/(w+1)). Emitted
    * per doc: k-gram/selection counts plus position- and hash-
    * checksums over the selected set, all recomputed by the oracle.
    *
    * Scale: pure scan-local HOFs (hash array → per-window argmin →
    * distinct positions) with no shuffle; the O(m·w) window scan is the
    * portability price of HOF form — the production splitter keeps a
    * monotone deque for O(m) — and the downstream shape is q20's
    * hash-group dedup over (fingerprint, doc) pairs.
    */
  private val q175 = Q("q175_winnowing_fingerprints",
    (s, d) => {
      // the one-pass native fingerprinter (primitive hash buffer +
      // monotone deque — no per-window array churn); WinnowingSpec
      // asserts it value-identical to the declarative
      // winnowSelect∘kgramHashes chain this query originally ran
      val k = 5; val w = 4
      Tables.fanOut(Tables.documents(s, d))
        .withColumn("fp",
          graft.operators.TextAnalysis.winnowFingerprints(col("text"), k, w))
        .select(col("doc_id"),
          greatest(length(col("text")) - (k - 1), lit(0)).cast("int")
            .as("n_kgrams"),
          size(col("fp")).as("n_selected"),
          aggregate(col("fp"), lit(0L),
            (a, x) => a + x.getField("pos")).as("sel_pos_sum"),
          aggregate(col("fp"), lit(0L),
            (a, x) => a + x.getField("hash")).as("sel_hash_sum"))
        .orderBy("doc_id")
    },
    Some(s"""WITH hp AS (
        SELECT doc_id, CAST(u.i AS BIGINT) AS i,
          ${TrainingDataQueries.duckHash32("md5(substr(text, CAST(u.i AS INTEGER), 5))")} AS h,
          len(text) - 4 AS m
        FROM documents, unnest(range(1, greatest(len(text) - 4, 0) + 1)) u(i)),
      wj AS (SELECT doc_id, CAST(u.j AS BIGINT) AS j
        FROM (SELECT doc_id, MAX(m) AS m FROM hp GROUP BY doc_id) t,
          unnest(range(1, greatest(m - 3, 0) + 1)) u(j)),
      wmin AS (SELECT wj.doc_id, wj.j, MIN(hp.h) AS mh
        FROM wj JOIN hp ON hp.doc_id = wj.doc_id
          AND hp.i BETWEEN wj.j AND wj.j + 3
        GROUP BY wj.doc_id, wj.j),
      sel AS (SELECT DISTINCT w.doc_id,
          (SELECT MAX(hp.i) FROM hp
            WHERE hp.doc_id = w.doc_id AND hp.h = w.mh
              AND hp.i BETWEEN w.j AND w.j + 3) AS p, w.mh
        FROM wmin w),
      per AS (SELECT doc_id,
          CAST(COUNT(DISTINCT p) AS INTEGER) AS n_selected,
          CAST(SUM(p) AS BIGINT) AS sel_pos_sum,
          CAST(SUM(mh) AS BIGINT) AS sel_hash_sum
        FROM (SELECT DISTINCT doc_id, p, mh FROM sel) GROUP BY doc_id)
      SELECT d.doc_id,
        CAST(greatest(len(d.text) - 4, 0) AS INTEGER) AS n_kgrams,
        COALESCE(per.n_selected, 0) AS n_selected,
        COALESCE(per.sel_pos_sum, 0) AS sel_pos_sum,
        COALESCE(per.sel_hash_sum, 0) AS sel_hash_sum
      FROM documents d LEFT JOIN per USING (doc_id) ORDER BY doc_id"""))

  /** Greedy maximum-coverage corpus selection (the classic (1−1/e)
    * submodular greedy, Nemhauser/Wolsey/Fisher 1978): pick 5 documents
    * one at a time, each maximizing the count of 3-shingles NOT yet
    * covered by earlier picks (ties → smallest doc_id). This is the
    * coverage-driven complement to q173's geometric coreset — the
    * "which documents add the most new content" selector behind
    * data-subset curation — and its marginal-gain sequence is the
    * certificate (non-increasing by submodularity; the spec asserts
    * it).
    *
    * Scale: each round is one aggregation over the (doc, shingle)
    * incidence with the covered set BROADCAST into a left join —
    * covered grows by one document's shingles per round, staying
    * KB-sized while corpus-sized work remains a scan + grouped count.
    * k rounds = k scans (the distributed greedy's standard cost); for
    * large k, production swaps in the stochastic/lazy-greedy variants
    * over the identical per-round dataflow.
    */
  private val q176 = Q("q176_greedy_coverage",
    (s, d) => {
      val e = Tables.fanOut(Tables.documents(s, d))
        .select(col("doc_id"), explode(graft.operators.TextAnalysis
          .shingles(graft.operators.TextAnalysis.tokens(col("text")), 3)).as("g"))
        .distinct().localCheckpoint()
      var picked = Vector.empty[(Long, Long)]
      var covered: Option[org.apache.spark.sql.DataFrame] = None
      for (_ <- 1 to 5) {
        val base =
          if (picked.isEmpty) e
          else e.filter(!col("doc_id").isin(picked.map(_._1): _*))
        val gains = covered match {
          case None => base.groupBy("doc_id").agg(count(lit(1)).as("gain"))
          case Some(c) => base
            .join(broadcast(c.withColumnRenamed("g", "cg")),
              col("g") === col("cg"), "left")
            .groupBy("doc_id")
            .agg(sum(when(col("cg").isNull, 1L).otherwise(0L)).as("gain"))
        }
        val win = gains.orderBy(col("gain").desc, col("doc_id").asc)
          .limit(1).head()
        picked = picked :+ ((win.getLong(0), win.getLong(1)))
        val newCov = e.filter(col("doc_id") === win.getLong(0)).select("g")
        covered = Some(covered.map(_.unionByName(newCov).distinct())
          .getOrElse(newCov).localCheckpoint())
      }
      val rows = picked.zipWithIndex.map { case ((id, g), i) => (i + 1, id, g) }
      s.createDataFrame(rows).toDF("rank", "doc_id", "gain").orderBy("rank")
    },
    Some {
      val rounds = (2 to 5).map { i =>
        val excl = (1 until i).map(p => s"SELECT doc_id FROM p$p")
          .mkString(" UNION ")
        s"""r$i AS (SELECT e.doc_id,
            CAST(SUM(CASE WHEN c.g IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS gain
          FROM e LEFT JOIN c${i - 1} c ON e.g = c.g
          WHERE e.doc_id NOT IN ($excl)
          GROUP BY e.doc_id),
        p$i AS (SELECT doc_id, gain FROM r$i ORDER BY gain DESC, doc_id LIMIT 1),
        c$i AS (SELECT g FROM c${i - 1}
          UNION SELECT e.g FROM e JOIN p$i USING (doc_id))"""
      }.mkString(",\n      ")
      val un = (1 to 5).map(i =>
        s"SELECT $i AS rank, doc_id, gain FROM p$i").mkString("\n        UNION ALL ")
      s"""WITH t AS (SELECT doc_id, ${TrainingDataQueries.duckToks} AS w FROM documents),
      s AS (SELECT doc_id, ${TrainingDataQueries.duckShingles("w")} AS sh FROM t),
      e AS (SELECT DISTINCT doc_id, unnest(sh) AS g FROM s),
      p1 AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS gain FROM e
        GROUP BY doc_id ORDER BY gain DESC, doc_id LIMIT 1),
      c1 AS (SELECT DISTINCT e.g FROM e JOIN p1 USING (doc_id)),
      $rounds
      SELECT CAST(rank AS INTEGER) AS rank, doc_id, gain FROM ($un)
      ORDER BY rank"""
    })

  /** Common-neighbor / Jaccard link prediction on the trade graph (the
    * recommender / related-entity primitive): candidate pairs share ≥ 10
    * common MID-DEGREE neighbors, score = the TRUNCATED-NEIGHBORHOOD
    * Jaccard |N₅₀(a)∩N₅₀(b)| / |N₅₀(a)∪N₅₀(b)| where N₅₀ keeps only
    * neighbors of degree ≤ 50 — numerator and denominator live on the
    * SAME filtered graph, so the score is a true Jaccard of truncated
    * neighborhoods (industrial link prediction standard: hub neighbors
    * carry no signal AND blow up Σdeg(n)², so they are excluded from
    * the metric, not just the join). No existing-edge filter is needed:
    * the graph is bipartite by construction (even/odd namespaces) and
    * candidate pairs are always same-side, so no a–b edge can exist
    * (certificate-asserted). Scale: two edge joins shuffled on the
    * middle node + a grouped count — the same bounded shape as q117's
    * degree-ordered triangles; top-50 is a TakeOrdered, not a global
    * sort.
    */
  private val q187 = Q("q187_link_prediction",
    (s, d) => {
      val g = tradeGraph(s, d)
      val deg = g.groupBy("src").agg(count(lit(1)).as("deg"))
      val mid = deg.filter(col("deg") <= 50).select(col("src").as("n"))
      // edges restricted to mid-degree targets: the truncated
      // neighborhoods N₅₀(·) that both cn and the degrees below use
      val gm = g.select(col("src"), col("dst").as("n")).join(mid, "n")
      val cn = gm.select(col("src").as("a"), col("n"))
        .join(gm.select(col("src").as("b"), col("n")), "n")
        .filter(col("a") < col("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("cn"))
        .filter(col("cn") >= 10)
      val degm = gm.groupBy("src").agg(count(lit(1)).as("degm"))
      val scored = cn
        .join(degm.select(col("src").as("a"), col("degm").as("dega")), "a")
        .join(degm.select(col("src").as("b"), col("degm").as("degb")), "b")
        .withColumn("jaccard",
          col("cn").cast("double") / (col("dega") + col("degb") - col("cn")))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(desc("jaccard"), asc("a"), asc("b"))
      scored.orderBy(desc("jaccard"), asc("a"), asc("b")).limit(50)
        .withColumn("rank", row_number().over(w).cast("int"))
        .select("rank", "a", "b", "cn", "jaccard")
        .orderBy("rank")
    },
    Some(s"""WITH $tradeGraphSql,
      deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
      mid AS (SELECT src AS n FROM deg WHERE deg <= 50),
      gm AS (SELECT e.src, e.dst AS n FROM e JOIN mid ON e.dst = mid.n),
      cn AS (SELECT x.src AS a, y.src AS b, COUNT(*) AS cn
        FROM gm x JOIN gm y ON x.n = y.n AND x.src < y.src
        GROUP BY x.src, y.src HAVING COUNT(*) >= 10),
      degm AS (SELECT src, COUNT(*) AS degm FROM gm GROUP BY src),
      sc AS (SELECT cn.a, cn.b, cn.cn,
          CAST(cn.cn AS DOUBLE) / (da.degm + db.degm - cn.cn) AS jaccard
        FROM cn JOIN degm da ON cn.a = da.src
          JOIN degm db ON cn.b = db.src),
      top AS (SELECT a, b, cn, jaccard FROM sc
        ORDER BY jaccard DESC, a, b LIMIT 50)
      SELECT CAST(row_number() OVER (ORDER BY jaccard DESC, a, b) AS INTEGER)
          AS rank, a, b, cn, jaccard
      FROM top ORDER BY rank"""))

  /** Newman modularity of label-propagation communities: per community
    * c, contribution e_c/2m − (d_c/2m)² (e_c = directed
    * within-community edges, d_c = degree mass, 2m = directed edge
    * count) — the standard "are these communities better than random"
    * score (Newman–Girvan 2004), closing the loop on the graph family:
    * label propagation finds communities, this prices them. ONE
    * propagation round (the trade graph's min label floods everything
    * by round 3 — 36 communities after round 1, 1 after round 3 at
    * sf0.01, so round 1 is where modularity discriminates).
    * All-rational double arithmetic (two divisions, one multiply per
    * community) — no libm.
    * Scale: two label equi-joins on the edge list (bucketed by node id
    * at ingest → local), one count per community, and a 1-row 2m scalar
    * broadcast; the per-community table is |labels|-sized.
    */
  private val q203 = Q("q203_modularity",
    (s, d) => {
      // the edge list feeds FOUR subtrees (2m scalar, e_in's two label
      // joins, the degree mass) plus the propagation round — checkpoint
      // it once so each reads materialized blocks instead of re-running
      // the orders×lineitem distinct (the r8 GC-variance culprit)
      val g = tradeGraph(s, d).localCheckpoint()
      val lbl = GraphOps.labelPropagationMin(g, 1)
      val tm = g.agg(count(lit(1)).as("tm"))
      val lab = lbl.select(col("node"), col("lbl"))
      val eIn = g
        .join(lab.select(col("node").as("src"), col("lbl").as("sl")), "src")
        .join(lab.select(col("node").as("dst"), col("lbl").as("dl")), "dst")
        .filter(col("sl") === col("dl"))
        .groupBy(col("sl").as("community")).agg(count(lit(1)).as("e_in"))
      val degMass = g.groupBy("src").agg(count(lit(1)).as("deg"))
        .join(lab.select(col("node").as("src"), col("lbl")), "src")
        .groupBy(col("lbl").as("community")).agg(
          sum("deg").as("deg_sum"), count(lit(1)).as("n_nodes"))
      degMass.join(eIn, Seq("community"), "left")
        .na.fill(0L, Seq("e_in"))
        .crossJoin(broadcast(tm))
        .withColumn("q_contrib",
          col("e_in").cast("double") / col("tm")
            - (col("deg_sum").cast("double") / col("tm"))
              * (col("deg_sum").cast("double") / col("tm")))
        .select("community", "n_nodes", "e_in", "deg_sum", "q_contrib")
        .orderBy("community")
    },
    Some {
      val rounds = (1 to 1).map { i =>
        s"""l$i AS (SELECT node, MIN(lbl) AS lbl FROM (
            SELECT e.dst AS node, p.lbl FROM e JOIN l${i - 1} p ON p.node = e.src
            UNION ALL SELECT node, lbl FROM l${i - 1}) GROUP BY node)"""
      }.mkString(",\n      ")
      s"""WITH $tradeGraphSql,
      n AS (SELECT DISTINCT src AS node FROM e),
      l0 AS (SELECT node, node AS lbl FROM n),
      $rounds,
      tm AS (SELECT COUNT(*) AS tm FROM e),
      ein AS (SELECT a.lbl AS community, COUNT(*) AS e_in
        FROM e JOIN l1 a ON e.src = a.node JOIN l1 b ON e.dst = b.node
        WHERE a.lbl = b.lbl GROUP BY a.lbl),
      dm AS (SELECT l1.lbl AS community,
          CAST(SUM(deg) AS BIGINT) AS deg_sum,
          COUNT(*) AS n_nodes
        FROM (SELECT src, COUNT(*) AS deg FROM e GROUP BY src) d
        JOIN l1 ON d.src = l1.node GROUP BY l1.lbl)
      SELECT dm.community, n_nodes, COALESCE(e_in, 0) AS e_in, deg_sum,
        CAST(COALESCE(e_in, 0) AS DOUBLE) / tm
          - (CAST(deg_sum AS DOUBLE) / tm) * (CAST(deg_sum AS DOUBLE) / tm)
          AS q_contrib
      FROM dm LEFT JOIN ein ON dm.community = ein.community
      CROSS JOIN tm ORDER BY dm.community"""
    })

  override val all: Seq[Q] = Seq(q165, q166, q167, q168, q169, q170, q171,
    q172, q173, q174, q175, q176, q187, q203)
}
