package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Render a double exactly as Python's `repr` / `json.dumps` would
  * (reference/src/sinks/jsonl.py:32-70 serializes floats via json.dumps),
  * so JSONL output stays byte-compatible outside the range where JVM and
  * CPython formatting happen to agree.
  *
  * Both CPython and the JVM print the shortest decimal-digit string that
  * round-trips to the same IEEE-754 double; they differ only in SURFACE
  * form. Python uses plain decimal when the leading digit's power of ten
  * `e` is in [-4, 16) and scientific (`1e-05`, `1.5e+20`: lowercase `e`,
  * signed, >=2-digit exponent) otherwise; Java switches to `5.0E-4`-style
  * scientific already below 1e-3 and at 1e7. This reformats the JVM's
  * digits into the CPython layout.
  *
  * Digit-selection caveat: on JDK < 19 `Double.toString` (legacy
  * FloatingDecimal) can pick a different same-length shortest candidate
  * than CPython for a handful of subnormal values (e.g. 5e-324 →
  * "4.9E-324" vs Python "5e-324"); normal-range wire values (prices,
  * sizes, latencies) are identical.
  *
  * NaN/±Infinity render as `NaN`/`Infinity`/`-Infinity` — json.dumps'
  * (non-standard-JSON) spellings, which the JVM shares.
  */
case class PyDoubleRepr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == DoubleType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"py_double_repr requires DOUBLE, got ${child.dataType.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(PyDoubleRepr.repr(input.asInstanceOf[Double]))

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "py_double_repr"
}

object PyDoubleRepr {

  /** CPython float repr of `v` (see class doc). */
  def repr(v: Double): String = {
    if (java.lang.Double.isNaN(v)) return "NaN"
    if (java.lang.Double.isInfinite(v)) return if (v > 0) "Infinity" else "-Infinity"
    val s = java.lang.Double.toString(v) // shortest round-trip digits
    val neg = s.charAt(0) == '-'
    val body = if (neg) s.substring(1) else s
    val eIdx = body.indexOf('E')
    val (mant, exp) =
      if (eIdx >= 0) (body.substring(0, eIdx), body.substring(eIdx + 1).toInt)
      else (body, 0)
    val dot = mant.indexOf('.')
    var digits = mant.substring(0, dot) + mant.substring(dot + 1)
    var e = exp + dot - 1 // value = d1.d2... * 10^e
    var lead = 0
    while (lead < digits.length - 1 && digits.charAt(lead) == '0') { lead += 1; e -= 1 }
    digits = digits.substring(lead)
    var end = digits.length
    while (end > 1 && digits.charAt(end - 1) == '0') end -= 1
    digits = digits.substring(0, end)
    if (digits == "0") return if (neg) "-0.0" else "0.0"
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
