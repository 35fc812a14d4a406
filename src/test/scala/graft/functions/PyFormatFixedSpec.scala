package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** PyFormatFixed must match CPython `f"{v:.Nf}"` digit-for-digit (golden
  * strings below produced by CPython 3.12). The distinguishing cases are
  * the dyadic midpoints (0.125, 1.25, 2.5) where CPython/C printf round
  * ties-to-even over the exact binary value while Java's `String.format`
  * rounds HALF_UP — and the near-midpoints (0.005, 1.35) that are NOT
  * actual ties because their binary expansion sits off the midpoint.
  */
class PyFormatFixedSpec extends AnyFunSuite {

  private val goldens: Seq[(Double, Int, String)] = Seq(
    // dyadic midpoints: ties-to-even (Java HALF_UP would say .13, 2.6, 3, 1.3)
    (0.125, 2, "0.12"),
    (0.375, 2, "0.38"),
    (-0.125, 2, "-0.12"),
    (2.5, 0, "2"),
    (3.5, 0, "4"),
    (1.25, 1, "1.2"),
    // NOT ties: exact binary value lies above/below the midpoint
    (0.005, 2, "0.01"),
    (1.35, 1, "1.4"),
    // plain rounding / padding
    (0.0001, 2, "0.00"),
    (44506.84, 2, "44506.84"),
    (1.0000000000058208, 2, "1.00"),
    (0.0, 3, "0.000"),
    (-0.0, 3, "-0.000"), // negative-zero sign preserved, like CPython
    (40.0, 3, "40.000"),
    (0.001, 3, "0.001"),
    (123.455, 3, "123.455"),
    (0.25, 6, "0.250000"),
    (33.333333333333336, 3, "33.333"),
    (5e-7, 6, "0.000000"),
    (1e20, 2, "100000000000000000000.00"),
    (0.1, 17, "0.10000000000000001"))

  test("fixed formatting matches CPython f-strings (incl. ties-to-even)") {
    goldens.foreach { case (v, p, want) =>
      assert(PyFormatFixed.format(v, p) == want, s"format($v, $p)")
    }
  }

  test("non-finite values use CPython spellings") {
    assert(PyFormatFixed.format(Double.NaN, 2) == "nan")
    assert(PyFormatFixed.format(Double.PositiveInfinity, 3) == "inf")
    assert(PyFormatFixed.format(Double.NegativeInfinity, 0) == "-inf")
  }

  test("diverges from Java HALF_UP exactly on dyadic midpoints") {
    // documents WHY format_string can't be used for reference parity
    assert(String.format("%.2f", Double.box(0.125)) == "0.13")
    assert(PyFormatFixed.format(0.125, 2) == "0.12")
  }
}
