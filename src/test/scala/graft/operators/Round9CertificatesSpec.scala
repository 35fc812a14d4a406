package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Whole-result / brute-force certificates for the round-9 operators —
  * the properties the row-value oracles cannot state.
  */
class Round9CertificatesSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("dHash is invariant under PNG re-encode (lossless codec round trip)") {
    // decode → re-encode → dHash must equal the original's: the dedup
    // key survives a transcode, which is the property that makes
    // re-uploaded copies collide
    (0L until 40L).foreach { id =>
      val w = (id % 64 + 16).toInt
      val h = (id % 48 + 16).toInt
      val png = Multimodal.ImageCodec.synthesizePng(id, w, h)
      val d1 = Multimodal.ImageCodec.dHash(png)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      val d2 = Multimodal.ImageCodec.dHash(bos.toByteArray)
      assert(d1 == d2, s"dHash changed across re-encode for doc $id")
      assert(d1.hashLo >= 0 && d1.hashLo < (1L << 32), "lo half out of range")
      assert(d1.hashHi >= 0 && d1.hashHi < (1L << 32), "hi half out of range")
    }
  }

  test("Theil-Sen equals the brute-force median of pairwise slopes, and shrugs off one outlier day") {
    val daily = SparkEntry.queries("q251_theil_sen_trend")(spark, sf)
      .select("event_type", "n_pairs", "theil_sen_slope")
      .as[(String, Long, Double)].collect()
    assert(daily.nonEmpty)
    // brute-force recompute from the same daily means
    val means = graft.Tables.events(spark, sf)
      .groupBy($"event_type", expr("ts_ms div 86400000").as("day"))
      .agg((graft.functions.StableAgg.dsum($"value") / count(lit(1))).as("v"))
      .as[(String, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sortBy(_._1)).toMap
    def slopes(pts: Seq[(Long, Double)]): Seq[Double] =
      for {
        i <- pts.indices; j <- (i + 1) until pts.size
      } yield (pts(j)._2 - pts(i)._2) / (pts(j)._1 - pts(i)._1).toDouble
    def floorMedian(xs: Seq[Double]): Double = {
      val s = xs.sorted
      s((0.5 * (s.size - 1)).toInt)
    }
    daily.foreach { case (et, nPairs, slope) =>
      val pts = means(et)
      val sl = slopes(pts)
      assert(sl.size == nPairs, s"$et pair count")
      assert(floorMedian(sl) == slope, s"$et median mismatch")
      // robustness: corrupt ONE day's mean by +1e6; the median of
      // pairwise slopes must move far less than the OLS slope does
      val corrupted = pts.updated(pts.size / 2,
        (pts(pts.size / 2)._1, pts(pts.size / 2)._2 + 1e6))
      val tsShift = math.abs(floorMedian(slopes(corrupted)) - slope)
      def ols(p: Seq[(Long, Double)]): Double = {
        val n = p.size.toDouble
        val sx = p.map(_._1.toDouble).sum; val sy = p.map(_._2).sum
        val sxy = p.map(t => t._1.toDouble * t._2).sum
        val sxx = p.map(t => t._1.toDouble * t._1).sum
        (n * sxy - sx * sy) / (n * sxx - sx * sx)
      }
      val olsShift = math.abs(ols(corrupted) - ols(pts))
      assert(tsShift < olsShift / 100.0,
        s"$et: Theil-Sen moved $tsShift vs OLS $olsShift under one outlier")
    }
  }

  test("interval union: covered <= raw, >= longest interval; matches a scalar sweep") {
    val got = SparkEntry.queries("q253_interval_union")(spark, sf)
      .select("user_id", "n_intervals", "n_islands", "raw_ms", "covered_ms")
      .as[(Long, Long, Long, Long, Long)].collect()
    val iv = graft.Tables.events(spark, sf)
      .select($"user_id", $"ts_ms".as("st"),
        ($"ts_ms" + (pmod($"event_id", lit(300)) + 60) * 1000L).as("en"))
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sortBy(identity)).toMap
    got.foreach { case (u, nIv, nIsl, raw, covered) =>
      val ivs = iv(u)
      assert(nIv == ivs.size)
      assert(covered <= raw, s"user $u covered > raw")
      assert(covered >= ivs.map(t => t._2 - t._1).max, s"user $u covered < longest")
      // scalar sweep-line recompute
      var islands = 0L; var cov = 0L
      var curStart = Long.MinValue; var curEnd = Long.MinValue
      ivs.foreach { case (st, en) =>
        if (st > curEnd) {
          if (curEnd > curStart) cov += curEnd - curStart
          islands += 1; curStart = st; curEnd = en
        } else if (en > curEnd) curEnd = en
      }
      if (curEnd > curStart) cov += curEnd - curStart
      assert(islands == nIsl, s"user $u islands $islands != $nIsl")
      assert(cov == covered, s"user $u covered $cov != $covered")
    }
  }

  test("ANN recall eval: bounds hold and brute-force truth is top-10 exact") {
    val rows = SparkEntry.queries("q258_ann_recall_eval")(spark, sf)
      .select("qid", "n_true", "n_pred", "n_hit")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (q, nTrue, nPred, nHit) =>
      assert(nTrue == 10, s"qid $q truth size $nTrue")
      assert(nPred <= 10 && nPred >= 0, s"qid $q pred size $nPred")
      assert(nHit <= math.min(nTrue, nPred), s"qid $q hits exceed sets")
    }
  }
}
