package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, ByteType,
  DataType, DoubleType, FloatType, IntegerType, LongType, ShortType}

/** Opt-in range-join predicate for [[RangeJoinRewrite]]: semantically
  * `point >= lo AND point <= hi` (it evaluates and codegens as exactly
  * that, so an uninstalled rule costs correctness nothing), carrying the
  * bin width the rewrite needs. It deliberately keeps all three operand
  * expressions as children so its references span BOTH join sides —
  * which is what keeps PushPredicateThroughJoin from hoisting it out of
  * the join condition before the rewrite can see it (the lesson from the
  * leaf-marker design: a no-reference conjunct is pushed below the join
  * as a trivial filter).
  */
case class RangePredicate(point: Expression, lo: Expression, hi: Expression,
    width: Double) extends Expression with Predicate {
  require(width > 0, s"bin width must be positive, got $width")
  override def children: Seq[Expression] = Seq(point, lo, hi)
  override def nullable: Boolean = true
  override def dataType: DataType = BooleanType
  override def foldable: Boolean = false

  /** The predicate this marker means; rewrites expand to exactly this.
    * A val: interpreted eval runs per row and must not rebuild the tree
    * (case-class `copy` via withNewChildrenInternal makes a fresh
    * instance, so caching per instance is safe).
    */
  @transient lazy val expanded: Expression =
    And(GreaterThanOrEqual(point, lo), LessThanOrEqual(point, hi))

  override def eval(input: InternalRow): Any = expanded.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    expanded.genCode(ctx) match { case c => ev.copy(code = c.code, isNull = c.isNull, value = c.value) }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(point = newChildren(0), lo = newChildren(1), hi = newChildren(2))
}

/** The classic range-join optimization (the one stock Catalyst lacks and
  * closed engines ship natively): an inner join on `point ∈ [lo, hi]`
  * plans as BroadcastNestedLoopJoin / CartesianProduct — O(|L|·|R|) pair
  * work and, past the broadcast threshold, a full cross shuffle. This
  * `Rule[LogicalPlan]` (injected via `SparkSessionExtensions
  * .injectOptimizerRule`, see [[graft.GraftExtensions]]) rewrites joins
  * whose condition carries a [[RangePredicate]] into an EQUI-join on
  * fixed-width bins:
  *
  *  - the point side gains `__graft_bin_l = floor(point / w)` — one
  *    scalar per row;
  *  - the interval side explodes to one row per bin its [lo, hi] span
  *    covers (`explode(sequence(floor(lo/w), floor(hi/w)))`);
  *  - the join becomes `bin_l = bin_r AND point >= lo AND point <= hi` —
  *    a hash-partitionable equality with the exact range predicate as
  *    residual, so results are IDENTICAL (a point lives in exactly one
  *    bin — no duplicate matches to dedup).
  *
  * At scale this turns the nested loop into a shuffle join whose per-key
  * work is points-per-bin × intervals-per-bin; `w` trades interval
  * replication against bucket size exactly like every LSH/banding
  * operator in this library. Opt-in per join (bin width is a semantic
  * choice only the caller can make) and self-extinguishing: the rewrite
  * replaces the marker with its expanded comparisons, so the fixed-point
  * optimizer batch cannot re-fire.
  */
/** Runtime guard target for [[RangeJoinRewrite]]'s interval explosion
  * (invoked via `StaticInvoke`, so it codegens as a plain static call).
  */
object RangeBins {
  /** Hard cap on bins one interval may explode to. A span past this is
    * either a non-finite bound (+∞ saturates to a Long.MaxValue bin) or
    * a width orders of magnitude below the data span — both would build
    * a multi-million-element array PER ROW; failing fast with the cause
    * beats an executor OOM, and silently emitting fewer bins would drop
    * rows the plain BETWEEN keeps.
    */
  final val MaxBinsPerInterval: Long = 1L << 20

  def overflow(binLo: Long, binHi: Long): ArrayData =
    throw new IllegalArgumentException(
      s"range_binned: one interval spans bins [$binLo, $binHi] — more " +
        s"than $MaxBinsPerInterval bins per interval. A non-finite bound " +
        "or a bin width far below the interval span; widen the width.")
}

object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), joinHint)
        if splitConjunctivePredicates(cond).exists(_.isInstanceOf[RangePredicate]) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val h = conjuncts.collectFirst { case r: RangePredicate => r }.get
      // Expand every OTHER marker to its comparisons in this same pass:
      // the output must never contain a marker, even if the enclosing
      // batch runs Once (a leftover marker is correct but unoptimized,
      // and would silently skip the rewrite it asked for).
      val rest = conjuncts.filterNot(_ eq h).map {
        case r: RangePredicate => r.expanded
        case e => e
      }

      def within(e: Expression, side: LogicalPlan): Boolean =
        e.references.nonEmpty && e.references.subsetOf(side.outputSet)

      // orientation: point from one side, both bounds from the other
      val oriented: Option[(LogicalPlan, LogicalPlan, Boolean)] =
        if (within(h.point, left) && within(h.lo, right) && within(h.hi, right))
          Some((left, right, false))
        else if (within(h.point, right) && within(h.lo, left) && within(h.hi, left))
          Some((right, left, true))
        else None

      // Exact binning only. Integral operands bin with native long
      // floor-division (Math.floorDiv): casting a >2^53 long (e.g. a
      // nanosecond epoch) to double first would round it, collapsing
      // distinct values into coarsened bins and breaking the documented
      // bin semantics. Floating operands keep the double path — IEEE
      // divide and floor are monotone, so a point's bin always lies
      // inside its covering interval's bin range. Anything else
      // (decimal, mixed integral/floating) cannot bin exactly here and
      // falls back to the expanded BETWEEN below.
      val opTypes = Seq(h.point.dataType, h.lo.dataType, h.hi.dataType)
      val binOfExact: Option[Expression => Expression] =
        if (opTypes.forall(t => t == ByteType || t == ShortType ||
              t == IntegerType || t == LongType) &&
            h.width == math.floor(h.width) && h.width >= 1.0 &&
            h.width <= (1L << 62).toDouble) {
          val wL = Literal(h.width.toLong, LongType)
          Some(e => StaticInvoke(classOf[java.lang.Math], LongType,
            "floorDiv", Seq(Cast(e, LongType), wL), Seq(LongType, LongType),
            returnNullable = false))
        } else if (opTypes.forall(t => t == DoubleType || t == FloatType)) {
          val w = Literal(h.width, DoubleType)
          Some(e => Cast(Floor(Divide(Cast(e, DoubleType), w)), LongType))
        } else None

      (oriented, binOfExact) match {
        case (Some((pointSide, intervalSide, flipped)), Some(binOf)) =>
          val binL = Alias(binOf(h.point), "__graft_bin_l")()
          val points2 = Project(pointSide.output :+ binL, pointSide)
          val binR = AttributeReference("__graft_bin_r", LongType)()
          // Sequence is TimeZoneAwareExpression: resolved only once the
          // session TZ is attached (irrelevant to Long sequences, but
          // required for `resolved`). Guard inverted/empty intervals
          // (lo > hi): Spark's sequence(a, b) defaults to step -1 when
          // a > b, which would explode a huge DESCENDING bin range for a
          // semantically-empty interval — emit zero bins instead (the
          // non-outer Generate then drops the row, exactly what the
          // plain BETWEEN returns for lo > hi).
          val binLo = binOf(h.lo)
          val binHi = binOf(h.hi)
          val arrTy = ArrayType(LongType, containsNull = false)
          // Bin-explosion guard: a span past MaxBinsPerInterval means a
          // non-finite bound (+∞ saturates to a Long.MaxValue bin) or a
          // width far below the data span — fail fast with the cause
          // instead of materializing a giant per-row array. The span is
          // compared in double space so Long.MaxValue − Long.MinValue
          // cannot wrap.
          val span = Subtract(Cast(binHi, DoubleType), Cast(binLo, DoubleType))
          val guarded = If(
            LessThanOrEqual(span,
              Literal(RangeBins.MaxBinsPerInterval.toDouble, DoubleType)),
            new Sequence(binLo, binHi, None, Some(conf.sessionLocalTimeZone)),
            StaticInvoke(classOf[RangeBins.type], arrTy, "overflow",
              Seq(binLo, binHi), Seq(LongType, LongType),
              returnNullable = false))
          val seq = If(LessThanOrEqual(binLo, binHi), guarded,
            Literal.create(Array.empty[Long], arrTy))
          val intervals2 = Generate(
            Explode(seq),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(binR), child = intervalSide)
          val newCond =
            (Seq(EqualTo(binL.toAttribute, binR), h.expanded) ++ rest).reduce(And)
          val (newLeft, newRight) =
            if (flipped) (intervals2, points2) else (points2, intervals2)
          Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), joinHint))
        case _ =>
          // unrecognizable orientation (e.g. literal bounds) or operand
          // types that cannot bin exactly: expand the marker to its
          // comparisons so the batch terminates with the exact original
          // semantics
          val expanded = (h.expanded +: rest).reduce(And)
          Join(left, right, Inner, Some(expanded), joinHint)
      }
  }
}
