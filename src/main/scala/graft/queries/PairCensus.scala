package graft.queries

import graft.GraftSession

/** Dev census of the WORK UNITS behind the pair-bound dedup queries, for
  * the third-decade scale table (docs/SCALING.md). The replicated scale
  * fixture grows every duplicate family linearly with the copy count
  * (GenScale word-rotates each source doc per copy, and rotation barely
  * perturbs a 3-shingle set), so candidate/qualifying PAIR populations
  * grow quadratically in the copy count while the corpus grows linearly —
  * a wall-vs-SF ratio alone misreads that as a plan regression. This tool
  * counts the pair populations each query actually processes so the table
  * can report wall per work unit:
  *
  *  - `lshPairs`     — LSH banding candidates (q22/q38/q170's driver)
  *  - `q135cand`     — prefix-filter candidates (q135's verify-join input)
  *  - `evalTruthCand`— shared-shingle pairs on the "eval" hash sample
  *                     (q188's exact-truth side; q194 uses the same
  *                     pairOverlap shape on its own sample)
  *
  * {{{ sbt "runMain graft.queries.PairCensus target/sf1 target/sf10" }}}
  */
object PairCensus {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("target/sf1", "target/sf10")
    val spark = GraftSession.get("pair-census", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    dirs.foreach { d =>
      val docs = graft.Tables.fanOut(graft.Tables.documents(spark, d)).count()
      val lsh = TrainingDataQueries.lshPairsFrame(spark, d).count()
      // capped pair populations (q313's guard): at the gate's fixture cap
      // and at a production-ish cap — the O(k·n) bound made countable
      val capGate = TrainingDataQueries
        .cappedLshPairsFrame(spark, d, TrainingDataQueries.CapK).count()
      val cap8 = TrainingDataQueries.cappedLshPairsFrame(spark, d, 8).count()
      // GRAFT_CENSUS_LSH_ONLY=1 skips the two multi-billion-row counts
      // (q135 candidates, eval truth pairs) when only the LSH/cap
      // populations are needed — at sf10 each costs ~10 min of count.
      val (candN, truth) =
        if (sys.env.contains("GRAFT_CENSUS_LSH_ONLY")) (-1L, -1L)
        else {
          val (_, cand) = TrainingDataQueries.q135Candidates(spark, d)
          val t = CurationQueries.pairOverlap(
            CurationQueries.shingleSets(
              CurationQueries.sampledDocs(spark, d, "eval"))).count()
          (cand.count(), t)
        }
      println(s"[census] dir=$d docs=$docs lshPairs=$lsh " +
        s"cappedK${TrainingDataQueries.CapK}=$capGate cappedK8=$cap8 " +
        s"q135cand=$candN evalTruthCand=$truth")
    }
    spark.stop()
  }
}
