package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Render a double exactly as Python's `repr` / `json.dumps` would
  * (reference/src/sinks/jsonl.py:32-70 serializes floats via json.dumps),
  * so JSONL output stays byte-compatible outside the range where JVM and
  * CPython formatting happen to agree.
  *
  * CPython prints the SHORTEST decimal-digit string that round-trips to
  * the same IEEE-754 double, plain decimal when the leading digit's power
  * of ten `e` is in [-4, 16) and scientific (`1e-05`, `1.5e+20`:
  * lowercase `e`, signed, >=2-digit exponent) otherwise. JDK 17's legacy
  * `Double.toString` is NOT always shortest (e.g. 2.13132399051318989E18
  * where 15 digits suffice — a 32k-value golden corpus against CPython
  * 3.12 caught this), so the digits are derived independently: the first
  * k in 1..17 whose correctly-rounded k-significant-digit form parses
  * back to the identical double. That string has no trailing zeros by
  * construction (a trailing-zero k-digit form implies the (k-1)-digit
  * form parses identically), and reading it back picks the same double
  * CPython's shortest-repr guarantees. The corpus test pins all regimes
  * including subnormals.
  *
  * NaN/±Infinity render as `NaN`/`Infinity`/`-Infinity` — json.dumps'
  * (non-standard-JSON) spellings, which the JVM shares.
  */
case class PyDoubleRepr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == DoubleType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"py_double_repr requires DOUBLE, got ${child.dataType.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(PyDoubleRepr.repr(input.asInstanceOf[Double]))

  // a real doGenCode (vs CodegenFallback) keeps the enclosing projection
  // inside whole-stage codegen — one static call per row
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.PyDoubleRepr$$.MODULE$$.repr($c))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "py_double_repr"
}

object PyDoubleRepr {

  private val contexts: Array[java.math.MathContext] =
    (0 to 17).map(k => new java.math.MathContext(
      math.max(k, 1), java.math.RoundingMode.HALF_EVEN)).toArray

  /** Shortest round-trip digits of `v` (finite, non-zero): the first
    * k in 1..17 whose CORRECTLY-ROUNDED (half-even, like dtoa — `%e`'s
    * half-up differs on the exact decimal midpoints common among big
    * integers) k-significant-digit decimal parses back to the identical
    * double. Returns (digits-without-zeros-padding, exponent of the
    * leading digit).
    */
  private def shortestDigits(v: Double): (String, Int) = {
    val exact = new java.math.BigDecimal(v) // exact binary expansion
    // round-trip success is monotone in k (more digits → strictly smaller
    // representation error), so binary-search the minimal k in [1, 17]
    var lo = 1
    var hi = 17
    while (lo < hi) {
      val mid = (lo + hi) / 2
      if (exact.round(contexts(mid)).doubleValue() == v) hi = mid else lo = mid + 1
    }
    val st = exact.round(contexts(lo)).stripTrailingZeros()
    val digits = st.unscaledValue().abs().toString
    // value = 0.d1d2... x 10^(precision - scale) => leading-digit e:
    (digits, st.precision() - st.scale() - 1)
  }

  /** CPython float repr of `v` (see class doc). */
  def repr(v: Double): String = {
    if (java.lang.Double.isNaN(v)) return "NaN"
    if (java.lang.Double.isInfinite(v)) return if (v > 0) "Infinity" else "-Infinity"
    if (v == 0.0) return if (1.0 / v < 0) "-0.0" else "0.0"
    val neg = v < 0
    val (digits, e) = shortestDigits(v)
    val sb = new java.lang.StringBuilder(26)
    if (neg) sb.append('-')
    if (e >= -4 && e < 16) {
      if (e >= digits.length - 1) {
        sb.append(digits)
        var i = digits.length - 1
        while (i < e) { sb.append('0'); i += 1 }
        sb.append(".0")
      } else if (e >= 0) {
        sb.append(digits, 0, e + 1).append('.').append(digits, e + 1, digits.length)
      } else {
        sb.append("0.")
        var i = -1
        while (i > e) { sb.append('0'); i -= 1 }
        sb.append(digits)
      }
    } else {
      sb.append(digits.charAt(0))
      if (digits.length > 1) sb.append('.').append(digits, 1, digits.length)
      sb.append('e').append(if (e < 0) '-' else '+')
      val ae = math.abs(e)
      if (ae < 10) sb.append('0')
      sb.append(ae)
    }
    sb.toString
  }
}
