package graft.operators

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Certificates for the governance/selection operators (sf0.001):
  * independent driver-side brute-force recomputes (not the DuckDB oracle
  * path — a second, hand-rolled implementation) plus structural
  * properties.
  */
class GovernanceCertificatesSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  /** Independent MD5 sign derivation (mirrors hexHash32∘md5 by hand). */
  private def jlSign(j: Int, i: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"jl:$j:$i".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val h32 = java.lang.Long.parseLong(hex.take(8), 16)
    if (h32 % 2 == 0) 1.0 else -1.0
  }

  test("q212 projection matches a driver-side recompute and preserves distances on average") {
    val proj = run("q212_jl_projection")
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    val vecs = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    // brute-force recompute for 10 vectors, left-to-right fold order
    vecs.keys.toSeq.sorted.take(10).foreach { id =>
      val x = vecs(id)
      val expect = (0 until 16).map { j =>
        x.indices.foldLeft(0.0)((a, i) => a + x(i) * jlSign(j, i))
      }
      assert(proj(id).toSeq == expect, s"projection mismatch for vec $id")
    }
    // JL: E[||ya-yb||^2] = k * ||xa-xb||^2 for ±1 signs; the mean ratio
    // over consecutive pairs must concentrate near 1 (fixed determinstic
    // signs — this is a one-time check of the realized matrix, not a
    // probabilistic flake).
    val ids = vecs.keys.toSeq.sorted
    val ratios = ids.sliding(2).collect { case Seq(a, b) =>
      val dx = vecs(a).zip(vecs(b)).map { case (u, v) => (u - v) * (u - v) }.sum
      val dy = proj(a).zip(proj(b)).map { case (u, v) => (u - v) * (u - v) }.sum
      dy / (16.0 * dx)
    }.toSeq
    val mean = ratios.sum / ratios.size
    assert(mean > 0.8 && mean < 1.2, s"JL mean distance ratio $mean")
  }

  test("q213 QI census partitions the event count and flags exactly the k>=5 groups") {
    val rows = run("q213_k_anonymity")
      .select("n", "anonymous").as[(Long, Boolean)].collect()
    assert(rows.map(_._1).sum == Tables.events(spark, sf).count())
    rows.foreach { case (n, anon) => assert(anon == (n >= 5)) }
    assert(rows.exists(_._2) && rows.exists(!_._2),
      "fixture should exercise both releasable and at-risk groups")
  }

  test("q214 importance matches a driver-side unigram-model recompute") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "lang", "text").as[(Long, String, String)].collect()
    val tokOf = (t: String) => t.split(" ").filter(_.nonEmpty).toSeq
    val all = docs.flatMap(d => tokOf(d._3))
    val en = docs.filter(_._2 == "en").flatMap(d => tokOf(d._3))
    val ct = en.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cs = all.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val (nt, ns, v) = (en.length.toLong, all.length.toLong, all.distinct.length.toLong)
    val got = run("q214_dsir_importance")
      .select("doc_id", "importance").as[(Long, Double)].collect().toMap
    docs.sortBy(_._1).take(20).foreach { case (id, _, text) =>
      val ts = tokOf(text)
      // exact-rational means: BigDecimal mirrors the decimal-route sum
      val spt = ts.map(t => BigDecimal((ct.getOrElse(t, 0L) + 1).toDouble /
        (nt + v).toDouble).setScale(18, BigDecimal.RoundingMode.HALF_UP)).sum
      val sps = ts.map(t => BigDecimal((cs(t) + 1).toDouble /
        (ns + v).toDouble).setScale(18, BigDecimal.RoundingMode.HALF_UP)).sum
      val expect = (spt.toDouble / ts.size) / (sps.toDouble / ts.size)
      assert(math.abs(got(id) - expect) <= math.ulp(expect) * 4,
        s"doc $id importance ${got(id)} != $expect")
    }
  }

  test("q215 OLS matches a driver-side least-squares fit per group") {
    val pts = Tables.events(spark, sf)
      .select($"event_type", hour($"ts_utc").cast("double"), $"value")
      .as[(String, Double, Double)].collect()
    val got = run("q215_group_ols")
      .select("event_type", "slope", "intercept", "r2")
      .as[(String, Double, Double, Double)].collect()
    got.foreach { case (et, slope, icept, r2) =>
      val g = pts.filter(_._1 == et)
      val n = g.length.toDouble
      val sx = g.map(_._2).sum; val sy = g.map(_._3).sum
      val sxy = g.map(p => p._2 * p._3).sum; val sxx = g.map(p => p._2 * p._2).sum
      val expSlope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val expIcept = (sy - expSlope * sx) / n
      assert(math.abs(slope - expSlope) < 1e-9 * math.max(1, math.abs(expSlope)), s"$et slope")
      assert(math.abs(icept - expIcept) < 1e-9 * math.max(1, math.abs(expIcept)), s"$et intercept")
      assert(r2 >= -1e-12 && r2 <= 1 + 1e-12, s"$et r2=$r2 out of [0,1]")
    }
  }
}
