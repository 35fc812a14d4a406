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
  DataType, DecimalType, DoubleType, FloatType, IntegerType, LongType,
  ShortType}

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
    *
    * Operands of differing types are WIDENED explicitly (the lossless
    * common type, e.g. decimal(12,2) vs decimal(10,1) → decimal(13,2)):
    * the marker expands during OPTIMIZATION, where the analyzer's type
    * coercion no longer runs, and a raw `a >= b` over mismatched decimal
    * scales is an unresolved expression that fails Spark's plan
    * validation. Same-typed operands (the common case) expand with no
    * cast at all.
    */
  @transient lazy val expanded: Expression = {
    def widened(a: Expression, b: Expression): (Expression, Expression) =
      if (a.resolved && b.resolved && a.dataType != b.dataType) {
        org.apache.spark.sql.catalyst.analysis.TypeCoercion
          .findWiderTypeForTwo(a.dataType, b.dataType) match {
          case Some(t) =>
            (if (a.dataType == t) a else Cast(a, t),
             if (b.dataType == t) b else Cast(b, t))
          case None => (a, b)
        }
      } else (a, b)
    val (p1, l1) = widened(point, lo)
    val (p2, h1) = widened(point, hi)
    And(GreaterThanOrEqual(p1, l1), LessThanOrEqual(p2, h1))
  }

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
      // inside its covering interval's bin range. Decimal operands
      // (possibly mixed with small integrals — price columns in real
      // market-data lakes are decimal) bin exactly in UNSCALED-LONG
      // space: every operand is losslessly rescaled to the common
      // (maximum) scale s, its unscaled long floor-divided by the
      // width's unscaled form at the same scale — pure integer
      // arithmetic, no double rounding anywhere. Anything else (mixed
      // integral/floating, longs alongside decimals — a long's 19
      // digits can overflow an 18-digit unscaled rescale) cannot bin
      // exactly here and falls back to the expanded BETWEEN below.
      val opTypes = Seq(h.point.dataType, h.lo.dataType, h.hi.dataType)
      // Max digits left of the decimal point, for the types the decimal
      // path accepts. Long (19 digits) is deliberately absent: 19 + s
      // always exceeds the 18-digit bound a lossless long-backed rescale
      // requires.
      val intDigits: PartialFunction[DataType, Int] = {
        case d: DecimalType => d.precision - d.scale
        case ByteType => 3
        case ShortType => 5
        case IntegerType => 10
      }
      def decScale(t: DataType): Int = t match {
        case d: DecimalType => d.scale
        case _ => 0
      }
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
        } else if (opTypes.exists(_.isInstanceOf[DecimalType]) &&
            opTypes.forall(intDigits.isDefinedAt)) {
          val s = opTypes.map(decScale).max
          // The width reaches here as a Double; its SHORTEST-ROUND-TRIP
          // decimal form (Double.toString) is the literal the author
          // wrote (0.05 → "0.05"), so parsing that recovers the intended
          // exact decimal width — the same convention Spark's own
          // double→decimal cast uses (Decimal.set(Double)).
          val wU = BigDecimal(java.lang.Double.toString(h.width)) *
            BigDecimal(10).pow(s)
          // Every operand must rescale to scale s within 18 digits total
          // (the bound for a loss-free long-backed unscaled value), and
          // the width must be a whole multiple of 10^-s — otherwise bins
          // at decimal precision can't be exact and we fall back.
          if (wU.isWhole && wU >= 1 && wU <= BigDecimal(Long.MaxValue) &&
              opTypes.forall(t => intDigits(t) + s <=
                org.apache.spark.sql.types.Decimal.MAX_LONG_DIGITS)) {
            val wL = Literal(wU.toLongExact, LongType)
            Some { e =>
              // Lossless by construction (precision covers every value of
              // the source type at scale s), so the cast can never
              // overflow-null and the bin is exact integer arithmetic.
              val prec = intDigits(e.dataType) + s
              StaticInvoke(classOf[java.lang.Math], LongType, "floorDiv",
                Seq(UnscaledValue(Cast(e, DecimalType(prec, s))), wL),
                Seq(LongType, LongType), returnNullable = false)
            }
          } else None
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
