package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the hot inner loop of book
  * normalization (N5): `array<array<string>>` OKX levels
  * `[px, sz, liquidated, count]` → `array<struct<price, size, count>>`,
  * silently skipping short or non-numeric levels
  * (reference/src/normalizer.py:97-121).
  *
  * Semantics are identical to the declarative form
  * (`filter(transform(..., try_cast ...))`) on the wire domain — plain
  * decimal/scientific numerics or garbage — but execute as one tight Java
  * loop instead of four nested interpreted lambda evaluations per level,
  * which dominated the normalizer's profile. (CodegenFallback: the
  * surrounding stage stays whole-stage-codegen'd and calls eval once per
  * row.)
  */
case class ParseBookLevels(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("price", DoubleType, nullable = false),
    StructField("size", DoubleType, nullable = false),
    StructField("count", IntegerType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = true

  private def parseDouble(s: UTF8String): java.lang.Double = {
    if (s == null) return null
    try java.lang.Double.valueOf(s.toString.trim)
    catch { case _: NumberFormatException => null }
  }

  private def parseInt(s: UTF8String): java.lang.Integer = {
    if (s == null) return null
    val t = s.toString.trim
    try java.lang.Integer.valueOf(t)
    catch { case _: NumberFormatException => null }
  }

  override def nullSafeEval(input: Any): Any = {
    val levels = input.asInstanceOf[ArrayData]
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow](levels.numElements())
    var i = 0
    while (i < levels.numElements()) {
      if (!levels.isNullAt(i)) {
        val lv = levels.getArray(i)
        if (lv.numElements() >= 4) {
          val px = parseDouble(if (lv.isNullAt(0)) null else lv.getUTF8String(0))
          val sz = parseDouble(if (lv.isNullAt(1)) null else lv.getUTF8String(1))
          val cnt = parseInt(if (lv.isNullAt(3)) null else lv.getUTF8String(3))
          if (px != null && sz != null && cnt != null) {
            out += InternalRow(px.doubleValue(), sz.doubleValue(), cnt.intValue())
          }
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "parse_book_levels"
}
