package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Certificates for the round-14 queries (sf0.001): whole-result
  * properties and independent recomputes the row-value oracles cannot
  * state.
  */
class Round14CertificatesSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  /** Hand-rolled mirror of the library hash chain hexHash32∘md5. */
  private def md5Hash32(x: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(8), 16)
  }

  test("q315: append-maintained lookup equals the plain full-scan filter") {
    val viaIndex = run("q315_bloom_index_append")
      .as[(Long, Long, String, Double)].collect().toSeq
    // independent probe derivation + plain scan, no Bloom anywhere:
    // 2 mod-97 probes from the base slice + the late file's smallest key
    val ev = Tables.events(spark, sf)
    val ids = ev.select($"event_id").as[Long].collect()
    val baseProbes = ids.filter(id => id % 16 != 15)
      .filter(id => md5Hash32(s"bfp:$id") % 97 == 0).sorted.take(2)
    val newProbe = ids.filter(id => id % 16 == 15).min
    val probes = (baseProbes :+ newProbe).distinct
    val plain = ev.filter($"event_id".isin(probes: _*))
      .select($"event_id", $"user_id", $"event_type", $"value")
      .orderBy("event_id")
      .as[(Long, Long, String, Double)].collect().toSeq
    assert(viaIndex == plain, "append-indexed lookup diverged from full scan")
    // the probe set must genuinely exercise the APPENDED filter
    assert(viaIndex.map(_._1).contains(newProbe),
      "no probe row from the late-ingested file")
  }

  test("q315: the append created only new manifest part-files, base filters untouched") {
    val (base, after, newFiles, probes) =
      LakehouseQueries.bloomAppendView(spark, sf)
    // every base manifest part-file survives at its snapshot size —
    // "adding files never rebuilds or resizes old filters", mechanically
    base.foreach { case (path, size) =>
      assert(after.get(path).contains(size),
        s"base manifest part-file rewritten or removed: $path")
    }
    // and the append genuinely added manifest rows (meta + words for the
    // late file land in NEW part-files)
    assert(after.size > base.size,
      s"append added no manifest part-files (${after.size} vs ${base.size})")
    assert(newFiles.nonEmpty, "no late data file was ingested")
    assert(probes.nonEmpty && probes.size <= 3)
  }

  test("q316: cascade is exact — per-doc verified counts equal q47's exact overlap") {
    // The cascade's entire claim: Bloom prefilter + exact verify ==
    // plain exact decontamination. Compare per-doc against the
    // independent q47 operator (full holdout broadcast, no Bloom).
    val cascade = run("q316_decontam_cascade")
      .select($"doc_id", $"n_sh", $"n_exact_hits", $"contaminated")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    val exact = run("q47_decontaminate")
      .select($"doc_id", $"n_sh", $"n_overlap", $"contaminated")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(cascade == exact,
      "cascade verified counts diverged from the exact operator — a Bloom " +
        "false negative or a verify-join defect")
    // and the prefilter is doing nontrivial work: some FPs must be killed
    // (the filter is deliberately small at fixture scale)
    val fp = run("q316_decontam_cascade")
      .agg(sum($"fp_killed")).as[Long].head()
    assert(fp > 0, "no false positives killed — the verify stage is untested")
  }

  test("q318: per-micro-batch admission equals the whole-corpus cascade") {
    // The online property under test: each doc's decision depends only
    // on its own shingles and the FIXED holdout index, so running the
    // cascade per arrival batch (3 micro-batches, idempotent batchId
    // writes) must reproduce the batch operator row-for-row.
    val streaming = run("q318_streaming_decontam")
      .as[(Long, Long, Long, Long, Long, Double, Boolean)]
      .collect().sortBy(_._1).toSeq
    val batch = run("q316_decontam_cascade")
      .as[(Long, Long, Long, Long, Long, Double, Boolean)]
      .collect().sortBy(_._1).toSeq
    assert(streaming == batch,
      "per-batch cascade diverged from the whole-corpus cascade")
    assert(streaming.nonEmpty)
  }

  // ---- q319 mechanism constants, recomputed independently of the query
  private val dpB = 40
  private val dpBreaks: Vector[Double] = {
    val alpha = math.exp(-0.5)
    val raw = (-dpB to dpB).map(k => math.pow(alpha, math.abs(k)))
    val total = raw.sum
    raw.scanLeft(0.0)(_ + _).tail.map(_ / total).dropRight(1).toVector
  }
  private def dpDraw(u: Double): Long = -dpB + dpBreaks.count(_ <= u)

  test("q319: every released z re-derives from the key hash; counts clamp correctly") {
    val rows = run("q319_dp_noisy_counts")
      .select($"event_type", $"day", $"gid", $"n_true", $"u", $"z", $"n_noisy",
        $"eps", $"eps_total")
      .as[(String, String, Long, Long, Double, Long, Long, Double, Double)]
      .collect().toSeq
    assert(rows.nonEmpty)
    assert(rows.exists(_._3 == 0L) && rows.exists(_._3 == 1L),
      "both release granularities must be present")
    rows.foreach { case (et, day, gid, nTrue, u, z, nNoisy, eps, epsTotal) =>
      val uRe = md5Hash32(s"dp:$gid:$et:$day").toDouble / 4294967296.0
      assert(uRe == u, s"u mismatch for dp:$gid:$et:$day")
      assert(dpDraw(u) == z, s"inverse-CDF draw mismatch for dp:$gid:$et:$day")
      assert(math.abs(z) <= dpB, "noise outside the truncation bound")
      assert(nNoisy == math.max(0L, nTrue + z), "clamp defect")
      // sequential-composition ledger: two releases touch every row
      assert(epsTotal == 2 * eps)
    }
    // true-count consistency across levels (pre-noise bookkeeping): each
    // event_type marginal equals the sum of its day cells
    val cells = rows.filter(_._3 == 0L).groupBy(_._1).view.mapValues(_.map(_._4).sum)
    rows.filter(_._3 == 1L).foreach { r =>
      assert(cells(r._1) == r._4, s"marginal n_true mismatch for ${r._1}")
    }
  }

  test("q319: the truncated-geometric mechanism matches its analytic pmf") {
    // CDF well-formedness
    assert(dpBreaks.forall(b => b > 0.0 && b < 1.0))
    assert(dpBreaks.sliding(2).forall { case Seq(a, b) => a < b; case _ => true })
    // empirical pmf over 20k hash-uniform draws vs the analytic
    // distribution: the inverse-CDF sampler IS the mechanism, so this
    // certifies calibration independent of any released fixture group
    val alpha = math.exp(-0.5)
    val raw = (-dpB to dpB).map(k => math.pow(alpha, math.abs(k)))
    val total = raw.sum
    val n = 20000
    val counts = new Array[Int](2 * dpB + 1)
    (0 until n).foreach { i =>
      val u = md5Hash32(s"dpcal:$i").toDouble / 4294967296.0
      counts((dpDraw(u) + dpB).toInt) += 1
    }
    (-3 to 3).foreach { k =>
      val emp = counts(k + dpB).toDouble / n
      val ana = raw(k + dpB) / total
      assert(math.abs(emp - ana) < 0.012,
        s"pmf miscalibrated at z=$k: empirical $emp vs analytic $ana")
    }
  }

  test("q321: the released curve re-derives from a from-scratch tree mechanism") {
    val rows = run("q321_dp_continual_counter")
      .select($"t", $"hour", $"c_bucket", $"c_prefix", $"released", $"err",
        $"n_nodes", $"err_bound", $"eps_item")
      .as[(Long, String, Long, Long, Long, Long, Long, Long, Double)]
      .collect().sortBy(_._1).toSeq
    assert(rows.nonEmpty)
    // independent reimplementation: hour census via a plain collect, then
    // the dyadic tree + noise + set-bit assembly in driver-side Scala
    val hourCounts = Tables.events(spark, sf)
      .groupBy(date_format($"ts_utc", "yyyy-MM-dd HH").as("hour"))
      .agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    val c = hourCounts.map(_._2).toArray
    val tMax = c.length
    def nodeSum(l: Int, j: Long): Long =
      ((j - 1) * (1L << l) until math.min(j * (1L << l), tMax.toLong))
        .map(b => c(b.toInt)).sum
    def nodeZ(l: Int, j: Long): Long =
      dpDraw(md5Hash32(s"dpc:$l:$j").toDouble / 4294967296.0)
    val levels = (0 to 20).filter(l => (1L << l) <= tMax)
    rows.foreach { case (t, hour, cb, cp, released, err, nNodes, bound, epsItem) =>
      assert(hour == hourCounts((t - 1).toInt)._1)
      assert(cb == c((t - 1).toInt))
      assert(cp == c.take(t.toInt).sum, s"true prefix mismatch at t=$t")
      val decomp = levels.filter(l => ((t >> l) & 1L) == 1L)
        .map(l => (l, (t >> (l + 1)) * 2 + 1))
      assert(nNodes == decomp.size && nNodes == java.lang.Long.bitCount(t),
        s"decomposition size defect at t=$t")
      val re = decomp.map { case (l, j) => nodeSum(l, j) + nodeZ(l, j) }.sum
      assert(re == released, s"released value mismatch at t=$t")
      assert(math.abs(err) <= bound, s"error outside the triangle bound at t=$t")
      assert(epsItem == 0.5 * levels.size, s"composition ledger wrong at t=$t")
    }
    // the mechanism must actually perturb: not every release is exact
    assert(rows.exists(_._6 != 0L), "all releases exact — noise never applied")
  }

  test("q320: streamed quota decisions equal the whole-corpus prefix-sum batch twin") {
    val online = run("q320_streaming_token_quota")
      .as[(Long, String, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    // independent batch twin: one window pass over the static table
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val batch = Tables.documents(spark, sf)
      .select($"doc_id", $"source",
        size(split($"text", " ")).cast("long").as("n_toks"))
      .withColumn("cum_toks", sum($"n_toks").over(w))
      .withColumn("admitted", $"cum_toks" <= 500L)
      .as[(Long, String, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(online == batch,
      "online quota decisions diverged from the batch prefix sum — " +
        "state drift, a dropped batch, or a doubled batch")
    // the quota line must genuinely be crossed: both admitted and
    // rejected docs exist, and per source the admitted set is a PREFIX
    // of arrival order (admission never reopens)
    assert(online.exists(_._5) && online.exists(!_._5),
      "fixture never crosses the quota — the gate is vacuous")
    online.groupBy(_._2).foreach { case (src, docs) =>
      val flags = docs.sortBy(_._1).map(_._5)
      assert(!flags.zip(flags.drop(1)).exists { case (a, b) => !a && b },
        s"source $src readmitted after the quota line")
    }
  }

  test("q317: allocation is the tight waterfill optimum") {
    val rows = run("q317_waterfill_budget")
      .select($"toks", $"budget", $"level", $"allocated", $"capped")
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(rows.nonEmpty)
    val budget = rows.head._2
    val level = rows.head._3
    val alloc = rows.map(_._4).sum
    // feasible: within budget; tight: raising the level by 1 overshoots
    assert(alloc <= budget, s"allocation $alloc exceeds budget $budget")
    val nextAlloc = rows.map(r => math.min(r._1, level + 1)).sum
    assert(nextAlloc > budget,
      s"level $level not tight: level+1 still fits ($nextAlloc <= $budget)")
    // per-domain consistency
    rows.foreach { case (toks, _, _, a, capped) =>
      assert(a == math.min(toks, level))
      assert(capped == (toks > level))
    }
  }
}
