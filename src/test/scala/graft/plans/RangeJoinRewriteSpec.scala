package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.RangeJoin

/** Equivalence and robustness of the injected range-join rewrite: the
  * binned plan must return EXACTLY the rows of the plain range-predicate
  * join on adversarial inputs (negative values, bin-boundary points,
  * nulls, empty intervals), must actually eliminate the nested-loop
  * join, and the hint must degrade gracefully when the pattern doesn't
  * match.
  */
class RangeJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("binned join equals the plain range join on adversarial inputs") {
    // points: boundary-exact (multiples of the width), negatives, nulls
    val pts = (Seq(-10.0, -7.5, -5.0, -0.0001, 0.0, 2.5, 5.0, 7.5, 9.999,
      10.0, 123.456) ++ (0 until 500).map(i => i * 0.37 - 30.0))
      .zipWithIndex.map { case (v, i) => (i.toLong, v: java.lang.Double) }
    val ptsWithNull = pts :+ (9999L, null.asInstanceOf[java.lang.Double])
    val left = ptsWithNull.toDF("pid", "v")
    // intervals: negative span start, zero-width, boundary-aligned, wide
    // (7) small inverted span; (8) HUGELY inverted span — without the
    // empty-bin guard, sequence(2e8, 0) would build a 200M-element
    // descending array per micro-partition instead of zero bins
    val iv = Seq((1L, -20.0, -5.0), (2L, -5.0, 5.0), (3L, 0.0, 0.0),
      (4L, 5.0, 5.0), (5L, 7.5, 30.0), (6L, 100.0, 200.0),
      (7L, 150.0, 100.0), (8L, 1.0e9, 0.0)).toDF("iid", "lo", "hi")
    val plain = left.join(iv, $"v" >= $"lo" && $"v" <= $"hi")
    val binned = RangeJoin.binned(left, $"v", iv, $"lo", $"hi", width = 5.0)
    assert(canon(binned) == canon(plain))
    assert(canon(binned).nonEmpty)
  }

  test("the rewrite removes the nested-loop join from the plan") {
    val left = (0 until 100).map(i => (i.toLong, i * 1.0)).toDF("pid", "v")
    val iv = Seq((1L, 10.0, 20.0), (2L, 50.0, 60.0)).toDF("iid", "lo", "hi")
    val plainPlan = left.join(iv, $"v" >= $"lo" && $"v" <= $"hi")
      .queryExecution.executedPlan.toString
    val binnedPlan = RangeJoin.binned(left, $"v", iv, $"lo", $"hi", 10.0)
      .queryExecution.executedPlan.toString
    assert(plainPlan.contains("BroadcastNestedLoopJoin") ||
      plainPlan.contains("CartesianProduct"),
      s"control: plain range join should be a nested loop:\n$plainPlan")
    assert(!binnedPlan.contains("BroadcastNestedLoopJoin") &&
      !binnedPlan.contains("CartesianProduct"),
      s"rewritten join still nested-loop:\n$binnedPlan")
  }

  test("an unorientable range predicate degrades to the plain BETWEEN, not a loop") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val left = Seq((1L, 1.0), (2L, 2.0), (3L, 7.0)).toDF("pid", "v")
    val right = Seq((10L, "a"), (20L, "b")).toDF("iid", "tag")
    // literal bounds: no interval side to explode — the rule must expand
    // the marker to its comparisons and leave the join shape alone
    val hinted = left.join(right, ColumnBridge.column(RangePredicate(
      ColumnBridge.expression($"v"), ColumnBridge.expression(lit(1.5)),
      ColumnBridge.expression(lit(8.0)), 1.0)))
    val plain = left.join(right, $"v" >= 1.5 && $"v" <= 8.0)
    assert(canon(hinted) == canon(plain))
    assert(canon(hinted).nonEmpty)
  }

  test("SQL surface: range_binned() resolves from SQL text and rewrites the join") {
    (0 until 200).map(i => (i.toLong, i * 0.5)).toDF("pid", "v")
      .createOrReplaceTempView("rj_points")
    Seq((1L, 10.0, 20.0), (2L, 77.0, 80.5)).toDF("iid", "lo", "hi")
      .createOrReplaceTempView("rj_intervals")
    val sqlDf = spark.sql(
      """SELECT pid, iid FROM rj_points p JOIN rj_intervals i
         ON range_binned(p.v, i.lo, i.hi, 5.0)""")
    val plan = sqlDf.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"SQL range join kept nested loop:\n$plan")
    val expect = spark.sql(
      """SELECT pid, iid FROM rj_points p JOIN rj_intervals i
         ON p.v >= i.lo AND p.v <= i.hi""").collect().map(_.toString).sorted.toSeq
    assert(sqlDf.collect().map(_.toString).sorted.toSeq == expect)
    assert(expect.nonEmpty)
  }

  test("width trades replication: interval rows explode to span/width bins") {
    // whitebox: the optimized plan of a binned join must contain the
    // generated bin columns (proof the rewrite, not some other path, ran)
    val left = Seq((1L, 1.0)).toDF("pid", "v")
    val iv = Seq((1L, 0.0, 100.0)).toDF("iid", "lo", "hi")
    val opt = RangeJoin.binned(left, $"v", iv, $"lo", $"hi", 10.0)
      .queryExecution.optimizedPlan.toString
    assert(opt.contains("__graft_bin_l") && opt.contains("__graft_bin_r"), opt)
  }
}
