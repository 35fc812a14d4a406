package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Space-filling-curve layout keys as Catalyst expressions (Z-order as a
  * codegen'd bit-interleave tree; Hilbert as the native
  * [[graft.functions.HilbertIndex]] node — no UDF registration or row
  * serialization fence in either, and both run over the bounded cell
  * census, never the data).
  *
  * Both curves map a (x, y) cell of the 256×256 grid to a 16-bit-range
  * key whose 1-D order preserves 2-D locality, which is what makes
  * min/max zone maps (q210) and file skipping work for
  * multi-dimensional predicates: rows close in (x, y) land in the same
  * file, so each file's bounding box stays small. Z-order interleaves
  * bits (cheap, jumps at power-of-two seams); Hilbert applies the
  * classic reflect-and-rotate recursion (Hilbert 1891; the iterative
  * xy2d form popularized by Warren's "Hacker's Delight" §16) and keeps
  * EVERY consecutive pair of cells grid-adjacent, so its file bounding
  * boxes are tighter — the reason lakehouse clustering engines moved
  * from Z-order to Hilbert curves.
  */
object SpaceFillingCurves {

  val GridOrder = 256 // 8 bits per dimension, keys in [0, 65536)

  /** Z-order (Morton) key: interleave the low 8 bits of x and y. */
  def zorderKey(x0: Column, y0: Column): Column =
    (0 until 8).map { b =>
      shiftleft(shiftright(x0.cast("long"), b).bitwiseAND(lit(1L)), 2 * b) +
        shiftleft(shiftright(y0.cast("long"), b).bitwiseAND(lit(1L)), 2 * b + 1)
    }.reduce(_ + _)

  /** Hilbert curve index of grid cell (x, y), x and y in [0, 256):
    * delegates to the native [[graft.functions.HilbertIndex]] expression.
    * NOT an unrolled `when`-tree: the loop carries (x, y, d) across 8
    * levels, and expression TREES duplicate every carried reference
    * (~5× per level → ~10⁵ Catalyst nodes, minutes of planning).
    */
  def hilbertKey(x0: Column, y0: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.HilbertIndex(
      ColumnBridge.expression(x0), ColumnBridge.expression(y0)))
  }

  /** Reference scalar implementation (the literal C-style loop) — the
    * spec cross-checks the expression against this on every grid cell.
    */
  def hilbertIndexScalar(x0: Int, y0: Int): Long =
    graft.functions.HilbertIndex.xy2d(x0, y0)
}
