package graft.queries

import graft.SparkSpec

/** Broadcast-robustness gate for the q142 vocabulary joins (VERDICT r5
  * item 5): the bigram-LM scoring joins rely on AQE choosing broadcast
  * for the vocabulary-sized model tables (c12, c1). This spec asserts
  * the FALLBACK is sane — with `autoBroadcastJoinThreshold=-1` the
  * w1-keyed model joins must degrade to co-partitioned shuffle joins
  * (SortMergeJoin / ShuffledHashJoin), never a nested-loop; the only
  * nested-loop allowed in the plan is the explicit 1-row scalar
  * `crossJoin(broadcast(voc))`, which is the correct shape at any
  * scale. Also re-executes the query under the disabled threshold and
  * checks row-identical results vs the normal plan: the physical
  * strategy change must be invisible in the output.
  */
class BroadcastRobustnessSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q142 with broadcast disabled: model joins become shuffle joins, never BNLJ/cartesian") {
    val run = graft.SparkEntry.queries("q142_bigram_lm_score")
    val expected = run(spark, sf).collect().map(_.toString).sorted

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = run(spark, sf)
      val plan = df.queryExecution.executedPlan.toString

      val nBnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
      val nCart = "CartesianProduct".r.findAllIn(plan).size
      val nShuffleJoin =
        "SortMergeJoin".r.findAllIn(plan).size +
          "ShuffledHashJoin".r.findAllIn(plan).size
      // the two w1-keyed model joins (c12, c1) must be key-shuffle joins
      assert(nShuffleJoin >= 2,
        s"expected >=2 shuffle joins for the model tables, got $nShuffleJoin in:\n$plan")
      // the only nested-loop allowed is the explicit 1-row voc broadcast
      assert(nBnlj <= 1, s"unexpected nested-loop joins ($nBnlj) in:\n$plan")
      assert(nCart == 0, s"cartesian product in fallback plan:\n$plan")

      val got = df.collect().map(_.toString).sorted
      assert(got.sameElements(expected),
        "q142 results changed when broadcast was disabled")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
