package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** `sorted_intersect_count(a, b)` — |a ∩ b| for two binary-ascending
  * SORTED, duplicate-free `array<string>` or `array<long>` columns, as a
  * zero-allocation merge walk over the serialized rows.
  *
  * Motivation (q135 prefix-filter join, r08): `size(array_intersect(a, b))`
  * builds a hash set per CANDIDATE PAIR — on the sf0.1 verify stage that is
  * ~300k pairs × two few-hundred-element arrays of allocation per bench
  * round, and that per-pair cost is exactly where the observed 7× CPU
  * variance lived (r7 bench outlier: identical input/plan, 6.5× CPU). The
  * merge walk compares elements in place (binary order, matching
  * `array_sort`'s ordering), allocates nothing, and is O(|a|+|b|) with no
  * hashing. The long variant exists because the verify stage's arrays
  * should be HASHES, not strings: 8-byte elements shrink the shuffled/
  * broadcast verify payload ~4× and the comparison to one subtraction. At
  * 100 TB the verify stage is the quadratic-adjacent part of the join — it
  * must be flat-cost per pair.
  *
  * Contract: inputs MUST be sorted ascending with `array_sort` (nulls last)
  * and duplicate-free (`array_distinct`); under that contract the result
  * equals `size(array_intersect(a, b))` exactly (property-tested A/B in
  * SetOpsSpec). Null array → null; null ELEMENTS terminate the walk (they
  * sort last and never compare equal, mirroring array_intersect's
  * null-never-matches semantics).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  private lazy val elemType: DataType = left.dataType match {
    case ArrayType(t, _) => t
    case _               => StringType
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    def elem(t: DataType) = t match {
      case ArrayType(e @ (StringType | LongType), _) => Some(e)
      case _ => None
    }
    (elem(left.dataType), elem(right.dataType)) match {
      case (Some(a), Some(b)) if a == b => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<string> or two array<long> inputs, " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
    }
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    if (elemType == LongType) {
      // null elements sort last: containsNull arrays need the guard before
      // the primitive read (isNullAt is cheap on UnsafeArrayData)
      while (i < na && j < nb) {
        if (a.isNullAt(i) || b.isNullAt(j)) return c
        val va = a.getLong(i)
        val vb = b.getLong(j)
        if (va == vb) { c += 1; i += 1; j += 1 }
        else if (va < vb) i += 1
        else j += 1
      }
    } else {
      while (i < na && j < nb) {
        val sa = a.getUTF8String(i)
        val sb = b.getUTF8String(j)
        if (sa == null || sb == null) {
          // nulls sort last: every remaining element on that side is null,
          // and null never equals anything — the walk is done.
          return c
        }
        val cmp = sa.compareTo(sb)
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
    }
    c
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "sorted_intersect_count"
}
