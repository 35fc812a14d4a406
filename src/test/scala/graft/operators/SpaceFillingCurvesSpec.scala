package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Properties of the curve-key Column trees over the ENTIRE 256×256
  * grid — exhaustive, not sampled (65 536 cells is cheap).
  */
class SpaceFillingCurvesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val grid = spark.range(0L, 65536L)
    .select((col("id") / 256).cast("int").as("x"),
      (col("id") % 256).cast("int").as("y"))

  test("hilbertKey Column tree equals the scalar reference on every cell") {
    val got = grid
      .select($"x", $"y", SpaceFillingCurves.hilbertKey($"x", $"y").as("d"))
      .as[(Int, Int, Long)].collect()
    assert(got.length == 65536)
    got.foreach { case (x, y, d) =>
      assert(d == SpaceFillingCurves.hilbertIndexScalar(x, y),
        s"mismatch at ($x,$y)")
    }
  }

  test("hilbert index is a bijection and consecutive cells are grid-adjacent") {
    // invert via the scalar reference: d -> (x, y)
    val inv = new Array[(Int, Int)](65536)
    var x = 0
    while (x < 256) {
      var y = 0
      while (y < 256) {
        val d = SpaceFillingCurves.hilbertIndexScalar(x, y)
        assert(d >= 0 && d < 65536, s"key out of range at ($x,$y): $d")
        assert(inv(d.toInt) == null, s"key collision at ($x,$y): $d")
        inv(d.toInt) = (x, y)
        y += 1
      }
      x += 1
    }
    // the defining Hilbert property (and why its file boxes are tight):
    // every step of the curve moves to a 4-neighborhood cell
    var d = 1
    while (d < 65536) {
      val (ax, ay) = inv(d - 1)
      val (bx, by) = inv(d)
      assert(math.abs(ax - bx) + math.abs(ay - by) == 1,
        s"curve jumps between d=${d - 1} ($ax,$ay) and d=$d ($bx,$by)")
      d += 1
    }
  }

  test("zorderKey matches direct bit interleave on every cell") {
    def ref(x: Int, y: Int): Long = {
      var k = 0L
      var b = 0
      while (b < 8) {
        k |= ((x >> b) & 1).toLong << (2 * b)
        k |= ((y >> b) & 1).toLong << (2 * b + 1)
        b += 1
      }
      k
    }
    val got = grid
      .select($"x", $"y", SpaceFillingCurves.zorderKey($"x", $"y").as("k"))
      .as[(Int, Int, Long)].collect()
    got.foreach { case (x, y, k) =>
      assert(k == ref(x, y), s"mismatch at ($x,$y)")
    }
  }
}
