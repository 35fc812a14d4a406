package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fixed-precision double formatting with CPython `f"{x:.Nf}"` semantics
  * (reference/src/sinks/stdout.py:24-31 formats prices `%.2f`, sizes
  * `%.6f`, µs latencies `%.3f` via f-strings; rolling.py:203-211 formats
  * CSV numerics `%.3f`).
  *
  * Python (and C printf / DuckDB's fmt-based `printf`) round the EXACT
  * binary value of the double to N fraction digits with ties-to-even;
  * Java's `String.format("%.Nf", …)` rounds HALF_UP instead, so dyadic
  * midpoints diverge: `0.125` → Python/C `"0.12"`, Java `"0.13"`. Trade
  * sizes like 0.125 BTC are exactly such midpoints, so `format_string`
  * cannot be byte-compatible with the reference console/CSV output.
  * This expression applies HALF_EVEN to the exact value (BigDecimal of
  * the double is that exact value), matching all three of CPython,
  * glibc printf, and DuckDB printf digit-for-digit.
  *
  * Sign of negative zero is preserved (`-0.0` → `"-0.00"`, like Python);
  * non-finite values render as Python's `"nan"` / `"inf"` / `"-inf"`.
  */
case class PyFormatFixed(child: Expression, prec: Int)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType != DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"py_format_fixed requires DOUBLE, got ${child.dataType.catalogString}")
    else if (prec < 0 || prec > 30)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"py_format_fixed precision must be in [0, 30], got $prec")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(PyFormatFixed.format(input.asInstanceOf[Double], prec))

  // a real doGenCode (vs CodegenFallback) keeps the enclosing projection
  // inside whole-stage codegen — one static call per row
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.PyFormatFixed$$.MODULE$$.format($c, $prec))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "py_format_fixed"
}

object PyFormatFixed {
  /** CPython `format(v, f".{prec}f")` (see class doc). */
  def format(v: Double, prec: Int): String = {
    if (java.lang.Double.isNaN(v)) return "nan"
    if (v == java.lang.Double.POSITIVE_INFINITY) return "inf"
    if (v == java.lang.Double.NEGATIVE_INFINITY) return "-inf"
    val neg = (java.lang.Double.doubleToRawLongBits(v) & java.lang.Long.MIN_VALUE) != 0L
    val body = new java.math.BigDecimal(math.abs(v)) // exact binary value
      .setScale(prec, java.math.RoundingMode.HALF_EVEN)
      .toPlainString
    if (neg) "-" + body else body
  }
}
