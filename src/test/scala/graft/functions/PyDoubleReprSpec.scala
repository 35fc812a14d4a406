package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** PyDoubleRepr must match CPython repr()/json.dumps layout (the expected
  * strings below were produced by CPython 3.12) and always round-trip.
  */
class PyDoubleReprSpec extends AnyFunSuite {

  private val pythonReprCases: Seq[(Double, String)] = Seq(
    0.0 -> "0.0",
    -0.0 -> "-0.0",
    5.0 -> "5.0",
    100.0 -> "100.0",
    0.1 -> "0.1",
    3.14 -> "3.14",
    92578.7 -> "92578.7",
    123456.789 -> "123456.789",
    // Java renders these scientific ("5.0E-4"); Python plain
    0.0005 -> "0.0005",
    0.0001 -> "0.0001",
    -0.00025 -> "-0.00025",
    // Java goes scientific at 1e7; Python at 1e16
    12345678.0 -> "12345678.0",
    1.2345678e10 -> "12345678000.0",
    1234567890123456.0 -> "1234567890123456.0",
    9999999999999998.0 -> "9999999999999998.0",
    // Python scientific forms: lowercase e, signed, 2-digit minimum
    1e-5 -> "1e-05",
    2.5e-10 -> "2.5e-10",
    1e16 -> "1e+16",
    1.5e16 -> "1.5e+16",
    1e22 -> "1e+22",
    -3.25e17 -> "-3.25e+17",
    1e100 -> "1e+100",
    1e-100 -> "1e-100",
    // json.dumps' non-standard spellings, shared with the JVM
    Double.PositiveInfinity -> "Infinity",
    Double.NegativeInfinity -> "-Infinity")

  test("matches CPython repr on layout-boundary cases") {
    pythonReprCases.foreach { case (v, expect) =>
      assert(PyDoubleRepr.repr(v) == expect, s"for $v")
    }
    assert(PyDoubleRepr.repr(Double.NaN) == "NaN")
  }

  test("every rendering round-trips to the identical double (10k seeded samples)") {
    val rnd = new java.util.Random(20260812L)
    var i = 0
    while (i < 10000) {
      val v = i % 4 match {
        case 0 => (rnd.nextDouble() - 0.5) * 2e7           // trading range
        case 1 => (rnd.nextDouble() - 0.5) * 2e-3          // tiny sizes
        case 2 => (rnd.nextDouble() - 0.5) * 2e20          // huge
        case _ => java.lang.Double.longBitsToDouble(rnd.nextLong()) // raw bits
      }
      if (!v.isNaN && !v.isInfinite) {
        val s = PyDoubleRepr.repr(v)
        assert(java.lang.Double.parseDouble(s) == v, s"round-trip failed: $v -> $s")
      }
      i += 1
    }
  }

  test("scientific notation appears exactly outside [1e-4, 1e16)") {
    val rnd = new java.util.Random(42L)
    var i = 0
    while (i < 2000) {
      val plain = 1e-4 + rnd.nextDouble() * (9.99e15 - 1e-4)
      assert(!PyDoubleRepr.repr(plain).contains("e"), s"for $plain")
      val sci = math.pow(10, -300 + rnd.nextDouble() * 295) // up to ~1e-5
      if (sci < 1e-4) assert(PyDoubleRepr.repr(sci).contains("e-"), s"for $sci")
      i += 1
    }
  }
}
