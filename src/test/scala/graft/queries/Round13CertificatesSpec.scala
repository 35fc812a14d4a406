// queries package: the spec reads the registry's private[queries] LSH
// constants (CapK, NumHashes) so the recompute can never desynchronize
package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** Certificates for the round-13 queries (sf0.01 — the cap must bind, and
  * the 3-member band buckets that exercise it exist at this SF, not at
  * sf0.001): whole-result properties and independent recomputes the
  * row-value oracle cannot state.
  */
class Round13CertificatesSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  /** Independent driver-side recompute of the capped-LSH machinery from
    * the raw (doc_id, band_idx, band_hash, quality) rows: families,
    * keep-best-k survivors, distinct pairs.
    */
  private lazy val bandRows: Seq[(Long, Int, String, Double)] = {
    val docs = Tables.fanOut(Tables.documents(spark, sf))
    val quality = docs.select(col("doc_id") +:
      TextAnalysis.qualityColumns(col("text"), TextAnalysis.tokens(col("text"))): _*)
      .select(col("doc_id"), col("quality_score"))
    val n = TrainingDataQueries.NumHashes
    val sigs = TrainingDataQueries.minhashSigFrame(spark, sf)
      .select(col("doc_id") +: Dedup.minhashColsFromArray(col("mhs"), n): _*)
      .select(col("doc_id") +: Dedup.bandCols(n, TrainingDataQueries.RowsPerBand): _*)
      .join(quality, "doc_id")
    (0 until TrainingDataQueries.NumBands).flatMap { b =>
      sigs.select(col("doc_id"), lit(b).as("bi"), col(s"band$b"), col("quality_score"))
        .as[(Long, Int, String, Double)].collect()
    }
  }

  private def pairsWithCap(k: Int): Set[(Long, Long)] =
    bandRows.groupBy(r => (r._2, r._3)).valuesIterator.flatMap { fam =>
      val kept = fam.sortBy(r => (-r._4, r._1)).take(k).map(_._1)
      for (a <- kept; b <- kept if a < b) yield (a, b)
    }.toSet

  test("q313: capped degree census equals a driver-side keep-best-k recompute") {
    val engine = run("q313_lsh_family_cap")
      .as[(Long, Long)].collect().toMap
    val pairs = pairsWithCap(TrainingDataQueries.CapK)
    val expected = pairs.toSeq.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(engine == expected, "capped candidate degrees diverged from recompute")
    assert(engine.nonEmpty, "fixture must produce at least one capped pair")
  }

  test("q313: the cap binds at this SF and capped pairs are a strict subset of uncapped") {
    val k = TrainingDataQueries.CapK
    val capped = pairsWithCap(k)
    val uncapped = pairsWithCap(Int.MaxValue)
    // cap only ever REMOVES candidates — it can never invent a pair
    assert(capped.subsetOf(uncapped), "cap invented a pair")
    // non-vacuous: the fixture has >k families, so the gate OBSERVES the
    // rank filter (if this fails, the fixture shrank — lower CapK)
    assert(capped != uncapped,
      s"cap k=$k is vacuous at $sf: no family exceeds it")
    // the work bound the operator exists for: every family contributes
    // at most C(k,2) pairs, so total pair work is O(k·n) at any corpus
    val perFamily = bandRows.groupBy(r => (r._2, r._3)).values.map { fam =>
      val kept = fam.sortBy(r => (-r._4, r._1)).take(k).map(_._1)
      kept.combinations(2).size
    }
    assert(perFamily.forall(_ <= k * (k - 1) / 2), "per-family pair bound broken")
  }

  test("q314: delta-state erasure equals q311's full-rewrite result row for row") {
    // same oracle, but pin the CROSS-QUERY equality directly too: the
    // bucket-versioned delta table and the monolithic versioned table
    // must converge to the identical post-erasure census
    val delta = run("q314_streaming_erasure_delta")
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    val full = run("q311_streaming_erasure")
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(delta == full, "delta state diverged from the full-rewrite twin")
    assert(delta.nonEmpty && delta.map(_._2).sum > 0)
  }

  test("q313: survivors are the q41 keep-best choice — every kept doc dominates every capped-out doc") {
    val k = TrainingDataQueries.CapK
    bandRows.groupBy(r => (r._2, r._3)).values.filter(_.size > k).foreach { fam =>
      val sorted = fam.sortBy(r => (-r._4, r._1))
      val (kept, dropped) = sorted.splitAt(k)
      val worstKept = kept.last
      dropped.foreach { d =>
        // (quality DESC, doc_id ASC): kept beats dropped on quality, or
        // ties on quality with the smaller doc_id
        assert(worstKept._4 > d._4 ||
          (worstKept._4 == d._4 && worstKept._1 < d._1),
          s"keep-best violated in family ${fam.head._2}/${fam.head._3}")
      }
    }
  }
}
