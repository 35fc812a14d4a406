package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert curve index of grid cell (x, y) on the 256×256 grid — the
  * iterative reflect-and-rotate xy2d walk as ONE expression node. The
  * 8-round loop is inherently imperative: unrolling it as a `when`/`Column`
  * tree duplicates the carried (x, y) subtrees ~5× per level (expression
  * trees share nothing), which explodes to ~10⁵ Catalyst nodes and
  * minutes of driver-side planning — the q62 single-Literal lesson in
  * expression form. One native node keeps planning O(1) and evaluation a
  * tight 8-iteration loop. Layout keying runs over the bounded cell
  * census (≤ 65 536 rows), so interpreted eval is not on any hot path.
  */
case class HilbertIndex(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullSafeEval(x: Any, y: Any): Any =
    java.lang.Long.valueOf(HilbertIndex.xy2d(
      x.asInstanceOf[Number].longValue().toInt,
      y.asInstanceOf[Number].longValue().toInt))

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "hilbert_index"
}

object HilbertIndex {
  val GridOrder = 256

  /** The classic scalar xy2d loop (reflection about the FULL grid,
    * `n−1−v`, so coordinates never go negative; lower levels only read
    * bits below s, where n−1−v and s−1−v agree).
    */
  def xy2d(x0: Int, y0: Int): Long = {
    var x = x0
    var y = y0
    var d = 0L
    var s = GridOrder / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1 else 0
      val ry = if ((y & s) > 0) 1 else 0
      d += s.toLong * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = GridOrder - 1 - x; y = GridOrder - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }
}
