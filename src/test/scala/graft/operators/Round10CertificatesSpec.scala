package graft.operators

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Whole-result / brute-force certificates for the round-10 operators —
  * the properties the row-value oracles cannot state (independent
  * recomputation in plain Scala, algebraic invariants, robustness).
  */
class Round10CertificatesSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  /** Exact decimal-route sum mirror: quantize like StableAgg (HALF_UP at
    * `scale`), sum exactly, render to double. */
  private def dsumMirror(xs: Seq[Double], scale: Int): Double =
    xs.map(x => BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP))
      .foldLeft(BigDecimal(0))(_ + _).toDouble

  test("q280: binned decimal join equals the brute-force BETWEEN join per band") {
    val got = q("q280_decimal_range_join")
      .select("band_id", "n_items").as[(Long, Long)].collect().toMap
    val prices = Tables.lineitem(spark, sf)
      .select($"l_extendedprice".cast("decimal(12,2)").cast("string"))
      .as[String].collect().map(BigDecimal(_))
    val brute = (0L until 60L).map { b =>
      val lo = BigDecimal(b * 2000)
      val hi = lo + BigDecimal("2999.99")
      b -> prices.count(p => p >= lo && p <= hi).toLong
    }.filter(_._2 > 0).toMap
    assert(got == brute, s"band counts diverge: got=$got brute=$brute")
    assert(got.nonEmpty)
    // overlapping bands: total matches must exceed distinct rows
    assert(got.values.sum > prices.length.toLong)
  }

  test("q281: variance ratio matches an independent recompute; VR(1) would be 1") {
    val got = q("q281_variance_ratio")
      .select("event_type", "n_d1", "n_d5", "vr5")
      .as[(String, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    val series = Tables.events(spark, sf)
      .select($"event_type", $"ts_ms", $"event_id", $"value")
      .as[(String, Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(t => (t._2, t._3)).map(_._4).toSeq).toMap
    def varPop(xs: Seq[Double]): Double = {
      val n = xs.size.toDouble
      dsumMirror(xs.map(x => x * x), 10) / n -
        (dsumMirror(xs, 6) / n) * (dsumMirror(xs, 6) / n)
    }
    got.foreach { case (et, n1, n5, vr) =>
      val vs = series(et)
      val d1 = vs.sliding(2).map(p => p(1) - p(0)).toSeq
      val d5 = vs.iterator.zipWithIndex.drop(5).map { case (v, i) => v - vs(i - 5) }.toSeq
      assert(d1.size == n1 && d5.size == n5, s"$et diff counts")
      val expect = varPop(d5) / (5.0 * varPop(d1))
      assert(math.abs(vr - expect) <= 1e-9 * math.max(1.0, math.abs(expect)),
        s"$et vr=$vr expect=$expect")
    }
  }

  test("q282: estimators are nonnegative/bounded and match a brute bar recompute") {
    val got = q("q282_range_volatility")
      .select("event_type", "n_bars", "parkinson", "garman_klass")
      .as[(String, Long, Double, Double)].collect()
    assert(got.nonEmpty)
    val rows = Tables.events(spark, sf)
      .select($"event_type", $"ts_ms", $"event_id", $"value")
      .as[(String, Long, Long, Double)].collect()
    val bars = rows.groupBy(r => (r._1, r._2 / 3600000L)).map { case (_, rs) =>
      val ord = rs.sortBy(r => (r._2 % 3600000L) * 68719476736L + r._3)
      val vs = rs.map(_._4)
      (rs.head._1, ord.head._4, vs.max, vs.min, ord.last._4)
    }.toSeq
    got.foreach { case (et, nBars, park, gkp) =>
      val mine = bars.filter(_._1 == et)
      assert(mine.size.toLong == nBars, s"$et bar count")
      assert(park >= 0.0, s"$et parkinson negative")
      assert(gkp <= 0.5 * park + 1e-15, s"$et gk exceeds half parkinson bound")
      val parks = mine.map { case (_, o, h, l, _) => ((h - l) / o) * ((h - l) / o) }
      val expect = dsumMirror(parks, 12) / parks.size
      assert(math.abs(park - expect) <= 1e-9 * math.max(1.0, expect), s"$et parkinson")
    }
  }

  test("q283: ACF panel matches a brute recompute and is Cauchy-Schwarz-bounded") {
    val got = q("q283_acf_panel")
      .select("event_type", "n_diffs", "acf1", "acf2", "acf3")
      .as[(String, Long, Double, Double, Double)].collect()
    assert(got.nonEmpty)
    val series = Tables.events(spark, sf)
      .select($"event_type", $"ts_ms", $"event_id", $"value")
      .as[(String, Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(t => (t._2, t._3)).map(_._4).toSeq).toMap
    got.foreach { case (et, n, a1, a2, a3) =>
      val d = series(et).sliding(2).map(p => p(1) - p(0)).toSeq
      assert(d.size.toLong == n)
      val denom = dsumMirror(d.map(x => x * x), 10)
      def acf(l: Int): Double =
        dsumMirror(d.drop(l).zip(d).map { case (x, y) => x * y }, 10) / denom
      Seq(a1 -> acf(1), a2 -> acf(2), a3 -> acf(3)).foreach { case (gotV, expV) =>
        assert(math.abs(gotV - expV) <= 1e-9, s"$et acf $gotV vs $expV")
        assert(math.abs(gotV) <= 1.05, s"$et acf out of plausible range")
      }
    }
  }

  test("q284: pair supports are brute-verifiable and lift ordering holds") {
    val got = q("q284_token_lift_pairs")
      .select("rank", "tok_a", "tok_b", "support", "lift")
      .as[(Int, String, String, Long, Double)].collect()
    assert(got.nonEmpty)
    val docToks = Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) => id -> t.split(" ", -1).toSet }
    val n = docToks.length.toLong
    val df = docToks.flatMap(_._2.iterator).groupBy(identity).view.mapValues(_.length.toLong).toMap
    // lift descends with rank; supports and lift identity recompute
    got.sliding(2).foreach {
      case Array(x, y) => assert(x._5 >= y._5, "lift not descending")
      case _ =>
    }
    got.foreach { case (_, a, b, support, lift) =>
      val brute = docToks.count { case (_, ts) => ts(a) && ts(b) }.toLong
      assert(brute == support, s"pair ($a,$b) support $support vs brute $brute")
      val expect = (support * n).toDouble / (df(a) * df(b)).toDouble
      assert(lift == expect, s"pair ($a,$b) lift identity")
      assert(df(a) * 25 >= n && df(b) * 25 >= n, "support floor violated")
    }
  }

  test("q285: transition rows sum to per-source totals and probabilities to 1") {
    val got = q("q285_markov_transitions")
      .select("from_type", "to_type", "n_trans", "p")
      .as[(String, String, Long, Double)].collect()
    assert(got.nonEmpty)
    val totalTrans = Tables.events(spark, sf)
      .groupBy($"user_id").agg((count(lit(1)) - 1).as("m"))
      .agg(sum($"m")).as[Long].head()
    assert(got.map(_._3).sum == totalTrans, "transition mass lost")
    got.groupBy(_._1).foreach { case (ft, rows) =>
      val psum = rows.map(_._4).sum
      assert(math.abs(psum - 1.0) <= 1e-9, s"$ft probabilities sum to $psum")
      val tot = rows.map(_._3).sum
      rows.foreach { case (_, _, c, p) =>
        assert(p == c.toDouble / tot.toDouble, s"$ft p identity") }
    }
  }

  test("q286: digit census is complete and chi2 terms are nonnegative") {
    val got = q("q286_benford_census")
      .select("digit", "n_obs", "expected_p", "chi2_term")
      .as[(Int, Long, Double, Double)].collect()
    assert(got.map(_._1).toSet == (1 to 9).toSet, "missing digits")
    val nOrders = Tables.orders(spark, sf).count()
    assert(got.map(_._2).sum == nOrders, "census row mass")
    assert(math.abs(got.map(_._3).sum - 1.0) <= 1e-9, "expected masses sum to 1")
    got.foreach { case (_, _, _, chi) => assert(chi >= 0.0) }
  }

  test("q287: FS scores equal the brute recompute and the threshold filter is exact") {
    val cust = Tables.customer(spark, sf)
      .select($"c_custkey", $"c_nationkey".cast("int"), $"c_acctbal")
      .as[(Long, Int, Double)].collect()
    val sup = Tables.supplier(spark, sf)
      .select($"s_suppkey", $"s_nationkey".cast("int"), $"s_acctbal")
      .as[(Long, Int, Double)].collect()
    val brute = for {
      (ck, cn, cb) <- cust; (sk, sn, sb) <- sup if cn == sn
      score = (if (math.abs(cb - sb) < 500.0) 2.2 else -0.8) +
        (if (ck % 10 == sk % 10) 1.6 else -0.5) +
        (if (cb > 0.0 && sb > 0.0) 0.3 else -0.1)
      if score >= 2.0
    } yield (ck, sk, score)
    val got = q("q287_linkage_fs_score")
      .select("c_custkey", "s_suppkey", "fs_score")
      .as[(Long, Long, Double)].collect()
    assert(got.sortBy(t => (t._1, t._2)).toSeq == brute.sortBy(t => (t._1, t._2)).toSeq)
    assert(got.nonEmpty)
  }

  test("q288: equi-depth buckets partition the table with counts within 1 and ordered bounds") {
    val got = q("q288_equi_depth_bounds")
      .select("bucket", "n_rows", "lo_price", "hi_price")
      .as[(Int, Long, Double, Double)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == (1 to 32).toSeq)
    assert(got.map(_._2).sum == Tables.lineitem(spark, sf).count())
    assert(got.map(_._2).max - got.map(_._2).min <= 1, "ntile size guarantee")
    got.foreach { case (_, _, lo, hi) => assert(lo <= hi) }
    got.sliding(2).foreach {
      case Array(a, b) => assert(a._4 <= b._3, "bucket bounds overlap beyond ties")
      case _ =>
    }
  }

  test("q289: weighted median crosses half the total weight, brute-verified") {
    val got = q("q289_weighted_median")
      .select("l_returnflag", "w_median", "total_w")
      .as[(String, Double, Double)].collect()
    assert(got.nonEmpty)
    val rows = Tables.lineitem(spark, sf)
      .select($"l_returnflag", $"l_extendedprice", $"l_orderkey", $"l_linenumber", $"l_quantity")
      .as[(String, Double, Long, Int, Double)].collect()
    got.foreach { case (flag, med, totW) =>
      val mine = rows.filter(_._1 == flag).sortBy(t => (t._2, t._3, t._4))
      val qs = mine.map(_._5)
      assert(math.abs(dsumMirror(qs, 6) - totW) <= 1e-9 * totW, s"$flag total weight")
      // brute: exact BigDecimal cumsum, first price crossing half
      var cum = BigDecimal(0)
      val half = BigDecimal(totW) / 2
      val crossed = mine.find { t =>
        cum += BigDecimal(t._5).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        cum >= half
      }
      assert(crossed.exists(_._2 == med), s"$flag weighted median $med")
    }
  }

  test("q291: AUC equals the brute all-pairs estimator (ties = half credit)") {
    val Array((nPos, nNeg, auc)) = q("q291_exact_auc")
      .select("n_pos", "n_neg", "auc").as[(Long, Long, Double)].collect()
    val scored = Tables.events(spark, sf)
      .select($"value", ($"event_type" === "purchase").cast("int"))
      .as[(Double, Int)].collect()
    val pos = scored.filter(_._2 == 1).map(_._1)
    val neg = scored.filter(_._2 == 0).map(_._1)
    assert(pos.length.toLong == nPos && neg.length.toLong == nNeg)
    // brute: Σ over all (p, n) pairs of [p > n] + 0.5·[p = n], exact in
    // halves (count twice, divide once)
    var twice = 0L
    for (p <- pos; n <- neg)
      twice += (if (p > n) 2L else if (p == n) 1L else 0L)
    val brute = twice.toDouble / (2.0 * (nPos * nNeg).toDouble)
    assert(auc == brute, s"auc $auc vs brute $brute")
    assert(auc > 0.0 && auc < 1.0)
  }

  test("q292: risk table is brute-consistent and the folded KM curve is a valid survival fn") {
    val got = q("q292_kaplan_meier")
      .select("dur_h", "n_risk", "deaths", "censored_n", "hazard")
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(got.nonEmpty)
    val ev = Tables.events(spark, sf).select($"user_id", $"ts_ms")
      .as[(Long, Long)].collect()
    val maxMs = ev.map(_._2).max
    val subj = ev.groupBy(_._1).values.map { rs =>
      val ms = rs.map(_._2)
      ((ms.max - ms.min) / 3600000L, ms.max >= maxMs - 43200000L)
    }.toSeq
    got.foreach { case (t, nRisk, d, c, hz) =>
      assert(nRisk == subj.count(_._1 >= t).toLong, s"n_risk at $t")
      assert(d == subj.count(s => s._1 == t && !s._2).toLong, s"deaths at $t")
      assert(c == subj.count(s => s._1 == t && s._2).toLong, s"censored at $t")
      assert(hz == d.toDouble / nRisk.toDouble && d > 0)
    }
    // fold the product: S must decrease strictly at each death time, stay in (0, 1]
    var s = 1.0
    got.foreach { case (_, n, d, _, _) =>
      val next = s * (1.0 - d.toDouble / n.toDouble)
      assert(next < s && next >= 0.0)
      s = next
    }
  }

  test("q293: profile census equals a brute driver-side profile") {
    val got = q("q293_profile_census")
      .select("col_name", "nulls", "n_distinct", "min_s", "max_s")
      .as[(String, Long, Long, String, String)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4, t._5)).toMap
    val rows = Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice",
        $"o_orderpriority").collect()
    def brute[T](i: Int)(implicit ord: Ordering[T]): (Long, Long, String, String) = {
      val vs = rows.toSeq.filter(!_.isNullAt(i)).map(_.get(i).asInstanceOf[T])
      (rows.count(_.isNullAt(i)).toLong, vs.distinct.length.toLong,
        vs.min.toString, vs.max.toString)
    }
    assert(got("o_orderkey") == brute[Long](0))
    assert(got("o_custkey") == brute[Long](1))
    assert(got("o_orderstatus") == brute[String](2))
    assert(got("o_totalprice") == brute[Double](3))
    assert(got("o_orderpriority") == brute[String](4))
  }

  test("q294: compaction plan conserves files/bytes and matches the brute sorted fill") {
    val got = q("q294_compaction_plan")
      .select("bin_id", "n_files", "bin_bytes", "fill_pct")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    val files = Tables.orders(spark, sf)
      .groupBy(date_trunc("month", $"o_orderdate").as("mon"),
        $"o_orderpriority".as("pri"))
      .agg((count(lit(1)) * 64L).as("bytes"))
      .select($"mon".cast("string"), $"pri", $"bytes")
      .as[(String, String, Long)].collect()
    assert(got.map(_._2).sum == files.length.toLong, "file conservation")
    assert(got.map(_._3).sum == files.map(_._3).sum, "byte conservation")
    // brute sorted fill
    val target = 131072L
    var cum = 0L
    val brute = files.sortBy(f => (-f._3, f._1, f._2)).map { f =>
      val bin = cum / target; cum += f._3; bin
    }
    val bruteBins = brute.groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    got.foreach { case (bin, n, bytes, fill) =>
      assert(bruteBins(bin) == n, s"bin $bin file count")
      assert(fill == bytes.toDouble / target.toDouble * 100.0)
    }
  }

  test("q295: out-of-fold means are exact and exclude exactly the row's fold") {
    val got = q("q295_target_encoding")
      .select("pri", "fold", "n_fold", "oof_mean")
      .as[(String, Int, Long, Double)].collect()
    assert(got.nonEmpty)
    val rows = Tables.orders(spark, sf)
      .select($"o_orderpriority", ($"o_orderkey" % 5).cast("int"), $"o_totalprice")
      .as[(String, Int, Double)].collect()
    got.foreach { case (pri, fold, nFold, oof) =>
      val inFold = rows.filter(r => r._1 == pri && r._2 == fold)
      val outFold = rows.filter(r => r._1 == pri && r._2 != fold)
      assert(inFold.length.toLong == nFold)
      val sumOut = outFold.map(r => BigDecimal(r._3)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum
      val expect = sumOut.toDouble / outFold.length.toDouble
      assert(math.abs(oof - expect) <= 1e-9 * math.max(1.0, expect),
        s"($pri, $fold) oof $oof vs $expect")
    }
  }

  test("q296: MASE components recompute from brute daily counts") {
    val got = q("q296_seasonal_mase")
      .select("event_type", "n_scored", "seasonal_abs_err", "naive_abs_err", "mase")
      .as[(String, Long, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    val daily = Tables.events(spark, sf)
      .select($"event_type", $"ts_ms").as[(String, Long)].collect()
      .groupBy(t => (t._1, t._2 / 86400000L)).view.mapValues(_.length.toLong).toMap
    got.foreach { case (et, n, sErr, nErr, mase) =>
      val days = daily.keys.filter(_._1 == et).map(_._2).toSeq.sorted
      val scored = days.filter(t =>
        daily.contains((et, t - 7)) && daily.contains((et, t - 1)) &&
          days.count(x => x < t) >= 7 && {
            // mirror the gate's LAG semantics: lag over PRESENT days
            val idx = days.indexOf(t)
            idx >= 7 && days(idx - 7) == t - 7 && days(idx - 1) == t - 1
          })
      assert(scored.size.toLong == n, s"$et n_scored")
      val se = scored.map(t => math.abs(daily((et, t)) - daily((et, t - 7)))).sum
      val ne = scored.map(t => math.abs(daily((et, t)) - daily((et, t - 1)))).sum
      assert(se == sErr && ne == nErr, s"$et error sums")
      assert(mase == se.toDouble / ne.toDouble)
    }
  }

  test("q297: chunk table equals brute chunking and covers every token") {
    val got = q("q297_rag_chunking")
      .select("doc_id", "chunk_idx", "n_tokens", "first_tok", "last_tok")
      .as[(Long, Int, Long, String, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    assert(docs.nonEmpty && got.nonEmpty)
    docs.foreach { case (id, text) =>
      val toks = text.split(" ", -1)
      val nChunks = math.max((toks.length - 9) / 24, 0) + 1
      val brute = (0 until nChunks).map { i =>
        val c = toks.slice(i * 24, math.min(i * 24 + 32, toks.length))
        (id, i, c.length.toLong, c.head, c.last)
      }
      assert(got(id).toSeq == brute, s"doc $id chunks")
      // coverage: every token index falls inside >=1 chunk
      val covered = (0 until nChunks).flatMap(i =>
        i * 24 until math.min(i * 24 + 32, toks.length)).toSet
      assert(covered == toks.indices.toSet, s"doc $id coverage")
    }
  }

  test("q298: contamination census equals the brute 8-gram overlap") {
    val got = q("q298_ngram_decontam")
      .select("doc_id", "n_grams", "n_contam", "contam_frac")
      .as[(Long, Long, Long, Double)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4)).toMap
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    def grams(t: String): Seq[String] = {
      val toks = t.split(" ", -1)
      if (toks.length < 8) Seq.empty
      else (0 to toks.length - 8).map(i => toks.slice(i, i + 8).mkString(" "))
    }
    val holdSet = docs.filter(_._1 % 10 == 0).flatMap(d => grams(d._2)).toSet
    val brute = docs.filter(_._1 % 10 != 0).flatMap { case (id, t) =>
      val gs = grams(t)
      val c = gs.count(holdSet.contains)
      if (c > 0 && gs.nonEmpty)
        Some(id -> (gs.size.toLong, c.toLong, c.toDouble / gs.size.toDouble))
      else None
    }.toMap
    assert(got == brute, s"got=$got brute=$brute")
    // no holdout doc ever appears; fractions in (0, 1]
    assert(got.keys.forall(_ % 10 != 0))
    assert(got.values.forall(v => v._3 > 0.0 && v._3 <= 1.0))
  }

  test("q299/q300: retrieval fusion and nDCG equal the brute recompute") {
    val vecs = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding", $"label")
      .as[(Long, Seq[Float], String)].collect()
    def dot(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.foldLeft(0.0)(_ + _)
    def cos(a: Seq[Float], b: Seq[Float]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    def l2sq(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) =>
        (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble)
      }.foldLeft(0.0)(_ + _)
    val anchors = vecs.filter(_._1 < 5)
    // brute both rankings per anchor
    val ranked = anchors.map { case (qid, qv, qLabel) =>
      val cand = vecs.filter(_._1 != qid)
      val rc = cand.sortBy(c => (-cos(qv, c._2), c._1)).map(_._1)
        .zipWithIndex.map { case (id, i) => id -> (i + 1) }.toMap
      val rl = cand.sortBy(c => (l2sq(qv, c._2), c._1)).map(_._1)
        .zipWithIndex.map { case (id, i) => id -> (i + 1) }.toMap
      (qid, qLabel, cand, rc, rl)
    }
    // q299: RRF top-10 equality
    val gotFused = q("q299_rrf_fusion")
      .select("qid", "fused_rank", "id", "rrf_score")
      .as[(Long, Int, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    ranked.foreach { case (qid, _, cand, rc, rl) =>
      val brute = cand.map { c =>
        val score = 1.0 / (60.0 + rc(c._1)) + 1.0 / (60.0 + rl(c._1))
        (c._1, score)
      }.sortBy(t => (-t._2, t._1)).take(10).zipWithIndex
        .map { case ((id, sc), i) => (qid, i + 1, id, sc) }
      assert(gotFused(qid).toSeq == brute.toSeq, s"q299 anchor $qid")
    }
    // q300: nDCG@10 equality + bounds
    val ws = Seq(1.0, 0.6309297535714575, 0.5, 0.43067655807339306,
      0.38685280723454163, 0.3562071871080222, 0.3333333333333333,
      0.31546487678572877, 0.3010299956639812, 0.2890648263178879)
    val gotN = q("q300_ndcg_at_10")
      .select("qid", "n_rel", "dcg", "idcg", "ndcg")
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(t => t._1 -> t).toMap
    ranked.foreach { case (qid, qLabel, cand, rc, _) =>
      val byId = cand.map(c => c._1 -> c._3).toMap
      val top = rc.toSeq.filter(_._2 <= 10).sortBy(_._2)
      val rels = top.map { case (id, _) => if (byId(id) == qLabel) 1 else 0 }
      val dcg = rels.zip(ws).map { case (r, w) => r.toDouble * w }.foldLeft(0.0)(_ + _)
      val nRel = rels.sum
      val idcg = ws.take(nRel).foldLeft(0.0)(_ + _)
      val (_, gN, gD, gI, gNd) = gotN(qid)
      assert(gN == nRel.toLong && gD == dcg, s"q300 anchor $qid dcg")
      assert(if (nRel > 0) gI == idcg && gNd == dcg / idcg
             else gI == 0.0 && gNd == 0.0, s"q300 anchor $qid idcg/ndcg")
      assert(gNd >= 0.0 && gNd <= 1.0 + 1e-15)
    }
  }

  test("q290: Gini matches a brute rank-formula recompute and sits in [0, 1)") {
    val got = q("q290_gini_concentration")
      .select("o_orderpriority", "n_orders", "gini")
      .as[(String, Long, Double)].collect()
    assert(got.nonEmpty)
    val orders = Tables.orders(spark, sf)
      .select($"o_orderpriority", $"o_totalprice", $"o_orderkey")
      .as[(String, Double, Long)].collect()
    got.foreach { case (pri, n, gini) =>
      val xs = orders.filter(_._1 == pri).sortBy(t => (t._2, t._3)).map(_._2).toSeq
      assert(xs.size.toLong == n)
      val sx = dsumMirror(xs, 6)
      val six = dsumMirror(xs.zipWithIndex.map { case (x, i) => (i + 1) * x }, 6)
      val expect = (2.0 * six - (n + 1).toDouble * sx) / (n.toDouble * sx)
      assert(math.abs(gini - expect) <= 1e-9, s"$pri gini $gini vs $expect")
      assert(gini >= 0.0 && gini < 1.0, s"$pri gini out of range")
    }
  }
}
