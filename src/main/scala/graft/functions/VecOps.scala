package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dense-vector kernels for the similarity/ANN operators.
  *
  * Spark's higher-order functions (`aggregate`, `zip_with`, `transform`)
  * are CodegenFallback expressions that allocate lambda bindings per
  * ELEMENT — on 64-dim embedding folds that interpretation overhead
  * dominates the ANN queries' CPU. These expressions run the same folds
  * as tight JVM loops, one virtual call per ROW.
  *
  * Bit-parity contract (spec-asserted A/B vs the declarative forms, which
  * the DuckDB oracles mirror): every accumulator folds left-to-right from
  * 0.0 in element order, exactly like
  * `aggregate(zip_with(a, b, (x,y) => f(x,y)), 0.0, (acc,x) => acc + x)`,
  * so results are IEEE-identical on any engine.
  *
  * Null semantics mirror the HOF chains: null array → null; arrays of
  * different lengths → null (zip_with pads with null, null poisons the
  * sum); any null ELEMENT → null.
  */
abstract class VecFold extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> inputs, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  protected def fold(a: ArrayData, b: ArrayData, n: Int): Any

  override def nullSafeEval(left: Any, right: Any): Any = {
    val a = left.asInstanceOf[ArrayData]
    val b = right.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      i += 1
    }
    fold(a, b, n)
  }
}

/** dot(a, b) = Σ a_i·b_i, left-to-right. */
case class VecDot(left: Expression, right: Expression) extends VecFold {
  override protected def fold(a: ArrayData, b: ArrayData, n: Int): Any = {
    var acc = 0.0d
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "vec_dot"
}

/** Squared euclidean distance Σ (a_i−b_i)², left-to-right. */
case class VecSqDist(left: Expression, right: Expression) extends VecFold {
  override protected def fold(a: ArrayData, b: ArrayData, n: Int): Any = {
    var acc = 0.0d
    var i = 0
    while (i < n) {
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "vec_sqdist"
}

/** Cosine similarity dot/(‖a‖·‖b‖): the three folds run in one pass, each
  * accumulated left-to-right independently — the combining arithmetic
  * `dot / (sqrt(sa) * sqrt(sb))` matches the declarative form's shape
  * exactly.
  *
  * Division is IEEE (zero norm → NaN/±Inf), matching DuckDB — the oracle
  * target — in EVERY session mode. This intentionally differs from the
  * declarative Spark form in ANSI sessions, where `/` raises
  * DIVIDE_BY_ZERO on a zero-norm vector: a data-dependent runtime error
  * inside a 100 TB scan is the wrong behavior for a similarity kernel
  * (spec-pinned, incl. the adversarial-values contract).
  */
case class VecCosine(left: Expression, right: Expression) extends VecFold {
  override protected def fold(a: ArrayData, b: ArrayData, n: Int): Any = {
    var dot = 0.0d
    var sa = 0.0d
    var sb = 0.0d
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      sa += x * x
      sb += y * y
      i += 1
    }
    dot / (math.sqrt(sa) * math.sqrt(sb))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "vec_cosine"
}
