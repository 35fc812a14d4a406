package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.Similarity

class VecOpsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("native cosine matches the declarative HOF fold bit-for-bit on real embeddings") {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val pairs = e.as("a").join(e.as("b"), col("b.vec_id") === col("a.vec_id") + 1)
    val native = pairs
      .select(col("a.vec_id"), Similarity.cosine(col("a.v"), col("b.v")).as("c"))
      .orderBy("vec_id").collect().map(_.getDouble(1)).toSeq
    val declarative = pairs
      .select(col("a.vec_id"), Similarity.cosineDeclarative(col("a.v"), col("b.v")).as("c"))
      .orderBy("vec_id").collect().map(_.getDouble(1)).toSeq
    assert(native.nonEmpty)
    // bit-exact, not approx: compare raw bits
    assert(native.map(java.lang.Double.doubleToRawLongBits) ==
      declarative.map(java.lang.Double.doubleToRawLongBits))
  }

  test("native dot/sqdist match declarative folds bit-for-bit incl. catastrophic-cancellation shapes") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      val n = 1 + rnd.nextInt(80)
      val a = Seq.fill(n)(rnd.nextDouble() * math.pow(10, rnd.nextInt(7) - 3) - 0.5)
      val b = Seq.fill(n)(rnd.nextDouble() * math.pow(10, rnd.nextInt(7) - 3) - 0.5)
      (i.toLong, a, b)
    }
    val df = rows.toDF("id", "a", "b")
    val declDot = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0d), (acc, x) => acc + x)
    val declSq = aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
      lit(0.0d), (acc, x) => acc + x)
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val nativeSq = ColumnBridge.column(VecSqDist(
      ColumnBridge.expression(col("a")), ColumnBridge.expression(col("b"))))
    val got = df.select(col("id"),
        Similarity.dot(col("a"), col("b")).as("nd"), declDot.as("dd"),
        nativeSq.as("ns"), declSq.as("ds"))
      .orderBy("id").collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(2)), s"dot id=${r.getLong(0)}")
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(3)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(4)), s"sqdist id=${r.getLong(0)}")
    }
  }

  test("bit parity holds for adversarial IEEE values: NaN, infinities, denormals, signed zero") {
    val specials = Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
      Double.MinPositiveValue, -0.0, 0.0, 1e308, -1e308, 4.9e-324)
    val rnd = new scala.util.Random(11)
    val rows = (0 until 100).map { i =>
      val n = 1 + rnd.nextInt(8)
      def v() = Seq.fill(n)(
        if (rnd.nextInt(3) == 0) specials(rnd.nextInt(specials.size))
        else rnd.nextDouble() - 0.5)
      (i.toLong, v(), v())
    }
    val df = rows.toDF("id", "a", "b")
    // the declarative divisor, computed WITHOUT dividing (no ANSI raise)
    val divisor = sqrt(aggregate(transform(col("a"), x => x * x), lit(0.0d), (s, x) => s + x)) *
      sqrt(aggregate(transform(col("b"), x => x * x), lit(0.0d), (s, x) => s + x))
    val declCos = Similarity.cosineDeclarative(col("a"), col("b"))
    // where the declarative form is defined (divisor != 0 under ANSI):
    // native must match bit-for-bit
    val defined = df.filter(divisor =!= 0.0d)
      .select(col("id"), Similarity.cosine(col("a"), col("b")).as("nc"), declCos.as("dc"))
      .orderBy("id").collect()
    assert(defined.nonEmpty)
    defined.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"nullness id=${r.getLong(0)}")
      // doubleToLongBits (not Raw): NaN payload/sign may differ between the
      // two evaluation paths — all NaNs are equal to the gate — while -0.0,
      // denormals, and infinities still compare exactly
      if (!r.isNullAt(1))
        assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(2)),
          s"id=${r.getLong(0)}: ${r.getDouble(1)} vs ${r.getDouble(2)}")
    }
    // where ANSI division would raise (zero norm): the native kernel keeps
    // IEEE semantics (NaN), like DuckDB — the documented contract
    val zeroNorm = df.filter(divisor === 0.0d)
      .select(Similarity.cosine(col("a"), col("b")).as("nc")).collect()
    zeroNorm.foreach(r => assert(r.isNullAt(0) || r.getDouble(0).isNaN))
  }

  test("null semantics mirror the HOF chains: null array, length mismatch, null element") {
    val df = Seq(
      (1L, Seq(1.0, 2.0), Seq(3.0, 4.0)),   // clean
      (2L, Seq(1.0, 2.0), Seq(3.0)),        // length mismatch
      (3L, null, Seq(3.0, 4.0))             // null side
    ).toDF("id", "a", "b")
      .union(Seq((4L, Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](3.0, 4.0)))
        .toDF("id", "a", "b")) // null element
    val out = df.select(col("id"), Similarity.dot(col("a"), col("b")).as("d"))
      .orderBy("id").collect()
    assert(!out(0).isNullAt(1) && out(0).getDouble(1) == 11.0)
    assert(out(1).isNullAt(1) && out(2).isNullAt(1) && out(3).isNullAt(1))
  }

  test("multi-probe LSH: candidates superset of single-probe, recall vs brute force no worse") {
    val e = Tables.embeddings(spark, dir)
    val corpus = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(Similarity.bruteForceTopK(corpus, queries, 5))
    val single = pairs(Similarity.lshBucketedTopK(corpus, queries, 5))
    val multi = pairs(Similarity.lshMultiProbeTopK(corpus, queries, 5))
    // more probes -> candidate superset -> recall can only improve
    // (top-k CONTENTS may differ: better candidates displace worse ones)
    assert((multi intersect brute).size >= (single intersect brute).size)
    assert(multi.nonEmpty && brute.nonEmpty)
  }

  test("ivfSampledTopK (literal quantizer) still matches brute force at nProbe = nlist") {
    val e = Tables.embeddings(spark, dir)
    val corpus = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val ivf = Similarity.ivfSampledTopK(corpus, queries, 5, nlist = 4, nProbe = 4)
      .orderBy("qid", "rank").collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    val brute = Similarity.bruteForceTopK(corpus, queries, 5)
      .orderBy("qid", "rank").collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(ivf == brute)
  }
}
