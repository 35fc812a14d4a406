package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions.{col, count, expr, lit, max, min}

/** Structural certificates of the curation operators (sf0.001): the
  * whole-result properties the row-value oracles cannot state.
  */
class CurationCertificatesSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q177 snapshot diff classes are disjoint and complete vs direct recompute") {
    val rows = run("q177_snapshot_diff")
      .select("o_orderkey", "change_type").as[(Long, String)].collect()
    assert(rows.map(_._1).distinct.length == rows.length, "key appears twice")
    val byClass = rows.groupBy(_._2).view.mapValues(_.length).toMap
    // added = keys ≡2 mod 7 absent from A... recompute independently:
    val keys = graft.Tables.orders(spark, sf)
      .select("o_orderkey").as[Long].collect().toSet
    val a = keys.filter(_ % 10 != 3); val b = keys.filter(_ % 7 != 2)
    assert(byClass.getOrElse("added", 0) == (b -- a).size)
    assert(byClass.getOrElse("removed", 0) == (a -- b).size)
    assert(byClass.getOrElse("changed", 0) == (a & b).count(_ % 5 == 0))
  }

  test("q178 frontier members are mutually non-dominating and dominate all others") {
    val docs = run("q178_pareto_frontier")
      .select("doc_id", "n_chars", "n_terms").as[(Long, Long, Long)].collect()
    for ((_, x1, y1) <- docs; (_, x2, y2) <- docs)
      assert(!(x2 > x1 && y2 > y1), "frontier member dominated by another")
    assert(docs.nonEmpty)
  }

  test("q179 tempered shares sum to ~1 and compress the raw distribution") {
    val rows = run("q179_temperature_mixture")
      .select("raw_share", "tempered_share").as[(Double, Double)].collect()
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-9)
    // sqrt-tempering pulls every share toward uniform: max share shrinks,
    // min share grows (weakly).
    assert(rows.map(_._2).max <= rows.map(_._1).max + 1e-12)
    assert(rows.map(_._2).min >= rows.map(_._1).min - 1e-12)
  }

  test("q181 loop runs are bounded by token count and detect a planted loop") {
    val rows = run("q181_repetition_loops")
      .select("doc_id", "n_tokens", "max_run_p1", "max_run_p2")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.forall { case (_, n, r1, r2) => r1 < n && r2 < n && r1 >= 0 && r2 >= 0 })
    // the fixture vocabulary is tiny, so SOME doc must contain a repeat
    assert(rows.exists(_._3 > 0) || rows.exists(_._4 > 0))
  }

  test("q182 tagging counts are consistent and top_tag null iff no hits") {
    val rows = run("q182_keyword_tagging")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.isNullAt(3)))
    assert(rows.forall { case (hits, terms, noTag) =>
      (hits == 0) == noTag && terms <= hits })
  }

  test("q183 BM25 ranks are dense per query and scores non-increasing") {
    val rows = run("q183_bm25_retrieval")
      .select("qid", "rank", "score").as[(Long, Int, Double)].collect()
      .groupBy(_._1)
    assert(rows.nonEmpty)
    for ((_, rs) <- rows) {
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length))
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._3 >= b._3; case _ => true })
    }
  }

  test("q184 quantile normalization preserves within-source ordering") {
    val rows = run("q184_quantile_normalize")
      .select("source", "n_chars", "norm_chars").as[(String, Long, Long)]
      .collect().groupBy(_._1)
    for ((_, rs) <- rows) {
      val byRaw = rs.sortBy(r => (r._2, r._3))
      assert(byRaw.sliding(2).forall {
        case Array(a, b) => a._3 <= b._3; case _ => true },
        "norm value must be monotone in the raw value within a source")
    }
  }

  test("q185 outliers are a strict minority and z-scores exceed 2 in magnitude") {
    val out = run("q185_embedding_outliers").select("z").as[Double].collect()
    assert(out.forall(z => math.abs(z) > 2.0))
    val total = graft.Tables.embeddings(spark, sf).count()
    assert(out.length < total / 4, "outlier screen flagged too much of the corpus")
  }

  test("q186 MAD flags are invariant to a planted extreme outlier's magnitude") {
    // robustness: every flagged deviation strictly exceeds 3×MAD and MAD > 0
    val rows = run("q186_mad_outliers")
      .select("value", "med", "mad").as[(Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (v, med, mad) => math.abs(v - med) > 3 * mad && mad >= 0 })
  }

  test("q188 dedup-eval counts are self-consistent") {
    val r = run("q188_dedup_eval").head()
    val (nPred, nTruth, tp, fp, fn) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(tp + fp == nPred && tp + fn == nTruth)
    assert(r.isNullAt(5) == (nPred == 0))
    assert(r.isNullAt(6) == (nTruth == 0))
    if (!r.isNullAt(5)) assert(r.getDouble(5) >= 0 && r.getDouble(5) <= 1)
    if (!r.isNullAt(6)) assert(r.getDouble(6) >= 0 && r.getDouble(6) <= 1)
  }

  test("q189 rendezvous: removing shard 3 moves ONLY shard-3 documents") {
    val rows = run("q189_rendezvous_shards")
      .select("doc_id", "shard", "shard_drop3").as[(Long, Long, Long)].collect()
    assert(rows.forall { case (_, s, s3) => s == 3 || s3 == s },
      "a non-shard-3 document moved when shard 3 was removed — HRW violated")
    assert(rows.forall { case (_, _, s3) => s3 != 3 })
    val counts = rows.groupBy(_._2).view.mapValues(_.length)
    assert(counts.size == 8, s"empty shards at sf0.001: ${counts.toMap}")
  }

  test("q187 predicted pairs are same-side (bipartite: no a-b edge can exist) and ranked") {
    val df = run("q187_link_prediction")
      .select("rank", "a", "b", "jaccard").as[(Int, Long, Long, Double)].collect()
      .sortBy(_._1)
    assert(df.nonEmpty)
    assert(df.sliding(2).forall {
      case Array(x, y) => x._4 >= y._4; case _ => true })
    // bipartite namespaces: predicted pairs are same-side (both even or both odd)
    assert(df.forall { case (_, a, b, _) => (a % 2) == (b % 2) })
  }

  test("q190 dup matrix is upper-triangular with positive counts") {
    val rows = run("q190_cross_source_dup_matrix")
      .select("src_lo", "src_hi", "n_pairs").as[(String, String, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (lo, hi, n) => lo <= hi && n > 0 })
  }

  test("q191 hard negatives never share the anchor's label") {
    val anchors = graft.Tables.embeddings(spark, sf).filter($"vec_id" < 5)
      .select("vec_id", "label").as[(Long, Int)].collect().toMap
    val rows = run("q191_hard_negatives")
      .select("qid", "label", "cos_sim").as[(Long, Int, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (q, l, _) => anchors(q) != l })
    assert(rows.forall { case (_, _, c) => c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9 })
  }

  test("q192 padding accounting is exact and utilization in (0, 1]") {
    val rows = run("q192_padding_efficiency")
      .select("bucket", "n_docs", "real_tokens", "padding", "utilization")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (b, n, t, p, u) =>
      t + p == b * n && u > 0 && u <= 1.0 })
  }

  test("q193 interleave positions are unique and per-source monotone") {
    val rows = run("q193_interleave_order")
      .select("doc_id", "source", "mix_pos").as[(Long, String, Long)].collect()
    assert(rows.map(_._3).distinct.length == rows.length)
    for ((_, rs) <- rows.groupBy(_._2)) {
      val sorted = rs.sortBy(_._1)
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).sorted.toSeq,
        "mix_pos must be increasing in doc_id within a source")
    }
  }

  test("q194 containment scores are in [0.8, 1] on distinct ordered pairs") {
    val rows = run("q194_containment_dedup")
      .select("inner_doc", "outer_doc", "containment").as[(Long, Long, Double)]
      .collect()
    assert(rows.forall { case (i, o, c) => i != o && c >= 0.8 && c <= 1.0 + 1e-12 })
  }

  test("q195 trimmed mean is within the untrimmed min/max and n_core ≈ 0.8n") {
    val core = run("q195_trimmed_mean")
      .select("event_type", "n_core", "trimmed_mean")
      .as[(String, Long, Double)].collect().toSeq
    assert(core.nonEmpty)
    val full = graft.Tables.events(spark, sf).groupBy("event_type")
      .agg(count(lit(1)).as("n"), min("value").as("lo"), max("value").as("hi"))
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    for ((t, nCore, tm) <- core) {
      val (_, n, lo, hi) = full(t)
      assert(nCore == n - 2 * (n / 10))
      assert(tm >= lo && tm <= hi)
    }
  }

  test("q196 BOW dedup groups at least as aggressively as exact dedup") {
    val bow = run("q196_bow_dedup_key").count()
    val exact = run("q20_dedup_exact").count()
    assert(bow <= exact, "BOW canonicalization cannot create MORE groups")
  }

  test("q197 domain caps: kept ≤ 20, kept + spilled = total") {
    val rows = run("q197_domain_cap")
      .select("n_docs", "n_kept", "n_spilled").as[(Long, Long, Long)].collect()
    assert(rows.forall { case (n, k, sp) => k <= 20 && k + sp == n })
  }

  test("q198 freshness weights: wmean within value range, wtot ≤ n") {
    val rows = run("q198_freshness_weights")
      .select("event_type", "n", "wtot", "wmean")
      .as[(String, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, n, wtot, _) => wtot > 0 && wtot <= n.toDouble })
  }

  test("q199 zipf head: counts non-increasing, cumulative share monotone in (0,1]") {
    val rows = run("q199_zipf_head")
      .orderBy("rank").select("cnt", "cum_share").as[(Long, Double)].collect()
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.sliding(2).forall {
      case Array(a, b) => a._1 >= b._1 && b._2 > a._2; case _ => true })
    assert(rows.last._2 <= 1.0 + 1e-12)
  }

  test("q200 funnel counts are monotone non-increasing with full retention at stage 0") {
    val rows = run("q200_curation_funnel")
      .orderBy("stage").select("n_docs", "retention").as[(Long, Double)].collect()
    assert(rows.length == 6)
    assert(rows.head._2 == 1.0)
    assert(rows.sliding(2).forall {
      case Array(a, b) => b._1 <= a._1; case _ => true })
  }

  test("q201 CUSUM magnitudes are nonnegative and |cp_cusum| equals cp_magnitude") {
    val rows = run("q201_cusum_changepoint")
      .select("cp_cusum", "cp_magnitude").as[(Double, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (c, m) => m >= 0 && math.abs(math.abs(c) - m) < 1e-12 })
  }

  test("q202 FD discovery: key FDs hold, non-keys are violated") {
    val rows = run("q202_fd_discovery")
      .select("fd", "holds").as[(String, Boolean)].collect().toMap
    assert(rows("orders.o_orderkey->o_custkey"), "primary key FD must hold")
    assert(!rows("lineitem.l_orderkey->l_suppkey"),
      "an order with multiple suppliers must violate")
  }

  test("q203 modularity contributions sum into [-1, 1] with e_in ≤ deg_sum") {
    val rows = run("q203_modularity")
      .select("e_in", "deg_sum", "q_contrib").as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (e, dm, _) => e <= dm })
    val q = rows.map(_._3).sum
    assert(q >= -1.0 - 1e-9 && q <= 1.0 + 1e-9, s"total modularity $q out of range")
  }

  test("q204 streaming tagging equals batch q182 row-for-row") {
    val batch = run("q182_keyword_tagging").collect().map(_.toString).sorted
    val stream = run("q204_streaming_tagging").collect().map(_.toString).sorted
    assert(stream.length == batch.length)
    assert(stream.sameElements(batch),
      "streaming path diverged from the batch dataflow")
  }

  test("q205 compaction: deleted keys absent, updated keys carry ver 1, others ver 0") {
    val rows = run("q205_upsert_compaction")
      .select("o_orderkey", "ver").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (k, _) => k % 11 != 0 }, "tombstoned key survived")
    assert(rows.forall { case (k, v) =>
      if (k % 3 == 0) v == 1 else v == 0 }, "latest-wins violated")
  }

  test("q206 compaction plan conserves bytes and packs all but the last bin full") {
    val files = graft.Tables.lineitem(spark, sf)
      .select(expr("cast(l_orderkey / 100 as long)").as("fid"))
      .distinct().count()
    val rows = run("q206_compaction_plan")
      .orderBy("bin").select("n_files", "tot_bytes").as[(Long, Long)].collect()
    assert(rows.map(_._1).sum == files, "a file was lost or duplicated")
    assert(rows.map(_._2).sum ==
      graft.Tables.lineitem(spark, sf).count(), "byte conservation violated")
  }

  test("q207 incremental refresh equals full recompute computed independently") {
    import graft.functions.StableAgg
    val full = graft.Tables.orders(spark, sf).groupBy("o_orderpriority")
      .agg(StableAgg.dsum(col("o_totalprice")).as("revenue"),
        count(lit(1)).as("n_orders"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val merged = run("q207_incremental_agg_refresh")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(merged == full, "state merge diverged from full recompute")
  }

  test("q180 blocked ER pairs are symmetric-free, ordered, and verified") {
    val rows = run("q180_er_blocking")
      .select("a_key", "b_key", "dist").as[(Long, Long, Int)].collect()
    assert(rows.forall { case (a, b, d) => a < b && d >= 0 && d <= 3 })
    assert(rows.map(p => (p._1, p._2)).distinct.length == rows.length)
  }

  test("q225 Gini impurity is bounded by the language count and zero iff pure") {
    val rows = run("q225_source_purity")
      .select("n_langs", "majority_share", "gini_impurity")
      .as[(Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (k, share, gini) =>
      assert(gini >= -1e-12 && gini <= 1.0 - 1.0 / k + 1e-12,
        s"gini $gini out of [0, 1-1/$k]")
      assert(share >= 1.0 / k - 1e-12 && share <= 1.0 + 1e-12)
      if (k == 1) assert(math.abs(gini) < 1e-12, "pure source must have gini 0")
    }
  }

  test("q226 drift rows are internally consistent and sorted by drift") {
    val rows = run("q226_distribution_drift")
      .select("p_old", "p_new", "abs_drift").as[(Double, Double, Double)].collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { case (p, q2, d) =>
      assert(p >= 0 && p <= 1 && q2 >= 0 && q2 <= 1)
      assert(math.abs(d - math.abs(p - q2)) < 1e-18)
    }
    assert(rows.map(_._3).toSeq.sliding(2).forall {
      case Seq(a, b) => a >= b
      case _ => true
    }, "not sorted by descending drift")
  }
}
