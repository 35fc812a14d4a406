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

  test("integral operands past 2^53 bin exactly (long floorDiv, no double rounding)") {
    // nanosecond-epoch magnitudes: base 2^60 — a long→double cast here
    // rounds to multiples of 256, which would coarsen bins; the exact
    // floorDiv path must keep the binned join identical to plain BETWEEN
    // AND nested-loop-free
    val base = 1L << 60
    val pts = (0L until 400L).map(i => (i, base + i * 3)).toDF("pid", "v")
    val iv = Seq((1L, base + 10, base + 40), (2L, base + 100, base + 100),
      (3L, base + 500, base + 200), // inverted → empty
      (4L, base + 700, base + 1300)).toDF("iid", "lo", "hi")
    val plain = pts.join(iv, $"v" >= $"lo" && $"v" <= $"hi")
    val binned = RangeJoin.binned(pts, $"v", iv, $"lo", $"hi", width = 7.0)
    assert(canon(binned) == canon(plain))
    assert(canon(binned).nonEmpty)
    val plan = binned.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"integral range join kept nested loop:\n$plan")
  }

  test("integral operands with a fractional width fall back to exact BETWEEN") {
    // 0.5 bins cannot be computed exactly in long arithmetic and the
    // double path would round >2^53 longs — the rule must expand the
    // marker (correct results; no silent mis-binning)
    val base = 1L << 60
    val pts = (0L until 50L).map(i => (i, base + i)).toDF("pid", "v")
    val iv = Seq((1L, base + 5, base + 12)).toDF("iid", "lo", "hi")
    val plain = pts.join(iv, $"v" >= $"lo" && $"v" <= $"hi")
    val binned = RangeJoin.binned(pts, $"v", iv, $"lo", $"hi", width = 0.5)
    assert(canon(binned) == canon(plain))
    assert(canon(binned).nonEmpty)
    val opt = binned.queryExecution.optimizedPlan.toString
    assert(!opt.contains("__graft_bin_l"), s"should not have binned:\n$opt")
  }

  test("a non-finite bound fails fast with the bin-overflow message, not an OOM") {
    val pts = Seq((1L, 5.0)).toDF("pid", "v")
    val iv = Seq((1L, 0.0, Double.PositiveInfinity)).toDF("iid", "lo", "hi")
    val ex = intercept[Exception] {
      RangeJoin.binned(pts, $"v", iv, $"lo", $"hi", width = 1.0).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(_.getMessage != null) &&
      causes(ex).exists(c => c.getMessage != null &&
        c.getMessage.contains("range_binned")), s"unexpected error: $ex")
  }

  test("two range markers on one join: no marker survives a single pass") {
    // second marker must be expanded to its comparisons in the SAME
    // rewrite application (batch may run Once); results stay exact
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val pts = (0 until 100).map(i => (i.toLong, i * 1.0, i * 2.0))
      .toDF("pid", "v", "u")
    val iv = Seq((1L, 10.0, 30.0, 25.0, 45.0), (2L, 50.0, 60.0, 90.0, 130.0))
      .toDF("iid", "lo", "hi", "lo2", "hi2")
    val cond = ColumnBridge.column(RangePredicate(
      ColumnBridge.expression($"v"), ColumnBridge.expression($"lo"),
      ColumnBridge.expression($"hi"), 5.0)) &&
      ColumnBridge.column(RangePredicate(
        ColumnBridge.expression($"u"), ColumnBridge.expression($"lo2"),
        ColumnBridge.expression($"hi2"), 5.0))
    val both = pts.join(iv, cond)
    val plain = pts.join(iv, $"v" >= $"lo" && $"v" <= $"hi" &&
      $"u" >= $"lo2" && $"u" <= $"hi2")
    assert(canon(both) == canon(plain))
    assert(canon(both).nonEmpty)
    val opt = both.queryExecution.optimizedPlan.toString
    assert(!opt.contains("rangepredicate") && !opt.contains("RangePredicate"),
      s"marker survived optimization:\n$opt")
  }

  test("range_binned rejects a non-literal width with the usage message") {
    (0 until 5).map(i => (i.toLong, i * 1.0)).toDF("pid", "v")
      .createOrReplaceTempView("rj_badw_points")
    Seq((1L, 0.0, 3.0)).toDF("iid", "lo", "hi")
      .createOrReplaceTempView("rj_badw_iv")
    val ex = intercept[Exception] {
      spark.sql("""SELECT * FROM rj_badw_points p JOIN rj_badw_iv i
         ON range_binned(p.v, i.lo, i.hi, i.hi)""").collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(c => c.getMessage != null &&
      c.getMessage.contains("width must be a numeric literal")),
      s"unexpected error: $ex")
  }

  test("decimal operands bin exactly in unscaled-long space") {
    // price-band shape: decimal(12,2) points against decimal(10,1)
    // bounds, width 2.5 — common scale 2, width unscaled 250. Boundary-
    // exact values (multiples of 2.5), negatives, and a null must all
    // match the plain BETWEEN, and the plan must be the bin equi-join
    // (pre-change, decimals fell back to BETWEEN → nested loop).
    val pts = ((0 until 400).map(i => (i.toLong, BigDecimal(i) * 0.37 - 30))
      :+ (9999L, null.asInstanceOf[BigDecimal]))
      .toDF("pid", "v").select($"pid", $"v".cast("decimal(12,2)").as("v"))
    val iv = Seq((1L, BigDecimal("-20.0"), BigDecimal("-5.0")),
      (2L, BigDecimal("-5.0"), BigDecimal("5.0")),
      (3L, BigDecimal("0.0"), BigDecimal("0.0")),
      (4L, BigDecimal("7.5"), BigDecimal("30.0")),
      (5L, BigDecimal("150.0"), BigDecimal("100.0"))) // inverted → empty
      .toDF("iid", "lo", "hi")
      .select($"iid", $"lo".cast("decimal(10,1)").as("lo"),
        $"hi".cast("decimal(10,1)").as("hi"))
    val plain = pts.join(iv, $"v" >= $"lo" && $"v" <= $"hi")
    val binned = RangeJoin.binned(pts, $"v", iv, $"lo", $"hi", width = 2.5)
    assert(canon(binned) == canon(plain))
    assert(canon(binned).nonEmpty)
    val opt = binned.queryExecution.optimizedPlan.toString
    assert(opt.contains("__graft_bin_l") && opt.contains("__graft_bin_r"),
      s"decimal operands did not take the bin path:\n$opt")
    val plan = binned.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"decimal range join kept nested loop:\n$plan")
  }

  test("mixed decimal/integer operands bin exactly (integral = scale 0)") {
    val pts = (0 until 300).map(i => (i.toLong, i - 50)).toDF("pid", "v")
      .select($"pid", $"v".cast("int").as("v"))
    val iv = Seq((1L, BigDecimal("-10.5"), BigDecimal("20.5")),
      (2L, BigDecimal("99.9"), BigDecimal("200.1")))
      .toDF("iid", "lo", "hi")
      .select($"iid", $"lo".cast("decimal(8,1)").as("lo"),
        $"hi".cast("decimal(8,1)").as("hi"))
    val plain = pts.join(iv, $"v" >= $"lo" && $"v" <= $"hi")
    val binned = RangeJoin.binned(pts, $"v", iv, $"lo", $"hi", width = 7.5)
    assert(canon(binned) == canon(plain))
    assert(canon(binned).nonEmpty)
    val opt = binned.queryExecution.optimizedPlan.toString
    assert(opt.contains("__graft_bin_l"),
      s"mixed decimal/int operands did not take the bin path:\n$opt")
  }

  test("decimals too wide for a lossless long rescale fall back to exact BETWEEN") {
    // decimal(38,10): 28 integer digits + scale 10 ≫ 18 — unscaled longs
    // can't hold a lossless rescale, so the rule must expand the marker
    // (correct results, no silent truncation); same for a width that is
    // not a whole multiple of 10^-scale
    val pts = Seq((1L, BigDecimal("1.5")), (2L, BigDecimal("7.25")))
      .toDF("pid", "v").select($"pid", $"v".cast("decimal(38,10)").as("v"))
    val iv = Seq((1L, BigDecimal("1.0"), BigDecimal("8.0")))
      .toDF("iid", "lo", "hi")
      .select($"iid", $"lo".cast("decimal(38,10)").as("lo"),
        $"hi".cast("decimal(38,10)").as("hi"))
    val plain = pts.join(iv, $"v" >= $"lo" && $"v" <= $"hi")
    val binned = RangeJoin.binned(pts, $"v", iv, $"lo", $"hi", width = 2.0)
    assert(canon(binned) == canon(plain))
    assert(canon(binned).nonEmpty)
    val opt = binned.queryExecution.optimizedPlan.toString
    assert(!opt.contains("__graft_bin_l"), s"should not have binned:\n$opt")

    val pts2 = Seq((1L, BigDecimal("1.50")), (2L, BigDecimal("7.25")))
      .toDF("pid", "v").select($"pid", $"v".cast("decimal(6,2)").as("v"))
    val iv2 = Seq((1L, BigDecimal("1.00"), BigDecimal("8.00")))
      .toDF("iid", "lo", "hi")
      .select($"iid", $"lo".cast("decimal(6,2)").as("lo"),
        $"hi".cast("decimal(6,2)").as("hi"))
    // width 0.005 < 10^-2: not representable at the common scale
    val b2 = RangeJoin.binned(pts2, $"v", iv2, $"lo", $"hi", width = 0.005)
    val p2 = pts2.join(iv2, $"v" >= $"lo" && $"v" <= $"hi")
    assert(canon(b2) == canon(p2))
    assert(!b2.queryExecution.optimizedPlan.toString.contains("__graft_bin_l"))
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
