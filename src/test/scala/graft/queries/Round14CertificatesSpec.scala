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
