package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Algebraic + statistical properties of the KMV sketch buffer that
  * q167's gate relies on: the merge must behave as a bounded set union
  * (commutative, associative, idempotent, partition-invariant) and the
  * full-sketch estimator must land within its theoretical error.
  */
class KmvSketchSpec extends AnyFunSuite {
  private val k = 64
  private val agg = new KmvSketchAgg(k)

  private def sketchOf(xs: Seq[Long]): Array[Long] =
    xs.foldLeft(agg.zero)(agg.reduce)

  private def hash(x: Long): Long = {
    // cheap splitmix-style scramble, enough for uniformity in tests
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  test("reduce keeps the k smallest distinct 63-bit values, sorted") {
    val rnd = new Random(7)
    val xs = Seq.fill(5000)(rnd.nextLong())
    val sk = sketchOf(xs)
    val expect = xs.map(_ >>> 1).distinct.sorted.take(k)
    assert(sk.toSeq == expect)
  }

  test("merge is union: commutative, associative, idempotent, partition-invariant") {
    val rnd = new Random(13)
    val xs = Seq.fill(3000)(rnd.nextLong())
    val whole = sketchOf(xs)
    // any partitioning merges back to the whole-stream sketch
    for (parts <- Seq(2, 3, 7)) {
      val pieces = xs.grouped(math.max(1, xs.size / parts)).map(sketchOf).toSeq
      assert(pieces.reduce(agg.merge).toSeq == whole.toSeq)
      assert(pieces.reverse.reduce(agg.merge).toSeq == whole.toSeq) // commut.
    }
    val a = sketchOf(xs.take(1000)); val b = sketchOf(xs.slice(1000, 2000))
    val c = sketchOf(xs.drop(2000))
    assert(agg.merge(agg.merge(a, b), c).toSeq ==
      agg.merge(a, agg.merge(b, c)).toSeq) // assoc.
    assert(agg.merge(whole, whole).toSeq == whole.toSeq) // idempotent
    assert(agg.merge(whole, agg.zero).toSeq == whole.toSeq) // identity
  }

  test("full-sketch estimator within 5/sqrt(k-2) relative error") {
    for (seed <- 1 to 5; n <- Seq(500, 5000, 50000)) {
      val sk = sketchOf((1L to n).map(i => hash(seed * 1000003L + i)))
      assert(sk.length == k)
      val theta = sk(k - 1).toDouble / 9.223372036854776e18
      val est = (k - 1).toDouble / theta
      val relErr = math.abs(est - n) / n
      assert(relErr <= 5.0 / math.sqrt(k - 2.0),
        s"seed=$seed n=$n est=$est relErr=$relErr")
    }
  }

  test("undersized sketch is the exact distinct hash set") {
    val xs = Seq(5L, 3L, 5L, 9L, 3L, 1L)
    assert(sketchOf(xs).toSeq == xs.map(_ >>> 1).distinct.sorted)
  }
}
