package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks
import scala.util.Random

/** Randomized properties of the extracted Curation operators: the
  * operator dataflow vs an in-memory brute-force reference on generated
  * inputs (seeded — reproducible). Complements the fixture-bound
  * certificates in CurationCertificatesSpec.
  */
class CurationPropertySpec extends SparkSpec with TableDrivenPropertyChecks {
  import spark.implicits._

  private val seeds = Table("seed", 1L, 7L, 42L)

  test("paretoFrontier2D equals the brute-force frontier on random point sets") {
    forEvery(seeds) { seed =>
      val rnd = new Random(seed)
      val pts = (0 until 300).map(i =>
        (i.toLong, rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      val df = pts.toDF("id", "x", "y")
      val got = Curation.paretoFrontier2D(df, "x", "y")
        .select("id").as[Long].collect().toSet
      val brute = pts.filter { case (_, x, y) =>
        !pts.exists { case (_, x2, y2) => x2 > x && y2 > y }
      }.map(_._1).toSet
      assert(got == brute, s"seed=$seed")
    }
  }

  test("rendezvousShard: removing any one shard moves only that shard's keys") {
    val keys = (0L until 500L).toDF("k")
    val full = keys.select(col("k"),
      Curation.rendezvousShard(col("k"), 0 until 6).as("s"))
    for (removed <- 0 until 6) {
      val reduced = keys.select(col("k"),
        Curation.rendezvousShard(col("k"),
          (0 until 6).filterNot(_ == removed)).as("s2"))
      val joined = full.join(reduced, "k").select("s", "s2")
        .as[(Long, Long)].collect()
      assert(joined.forall { case (s, s2) => s == removed.toLong || s2 == s },
        s"non-removed key moved when shard $removed was dropped")
      assert(joined.forall(_._2 != removed.toLong))
    }
  }

  test("trimmedMean equals the brute-force trimmed mean on random groups") {
    forEvery(seeds) { seed =>
      val rnd = new Random(seed)
      val rows = (0 until 400).map(i =>
        (i.toLong, s"g${i % 3}", math.floor(rnd.nextDouble() * 1000) / 8))
      val df = rows.toDF("id", "g", "v")
      val got = Curation.trimmedMean(df, "g", "v", "id")
        .select("g", "n_core", "trimmed_mean")
        .as[(String, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      for ((g, grp) <- rows.groupBy(_._2)) {
        val sorted = grp.sortBy(r => (r._3, r._1))
        val cut = sorted.length / 10
        val core = sorted.slice(cut, sorted.length - cut)
        val (nCore, mean) = got(g)
        assert(nCore == core.length, s"seed=$seed group=$g")
        // operator uses exact decimal sums; reference in BigDecimal
        val ref = core.map(r => BigDecimal(r._3).setScale(6, BigDecimal.RoundingMode.HALF_UP))
          .sum.toDouble / core.length
        assert(math.abs(mean - ref) < 1e-9, s"seed=$seed group=$g $mean vs $ref")
      }
    }
  }

  test("cusumChangepoint picks the brute-force |CUSUM| peak with full-order tie-break") {
    forEvery(seeds) { seed =>
      val rnd = new Random(seed)
      // symmetric ±1 deviations make |CUSUM| ties common — the tie-break case
      val rows = (0 until 300).map { i =>
        (i.toLong, s"g${i % 3}", if (rnd.nextBoolean()) 1.0 else -1.0)
      }
      val df = rows.toDF("id", "g", "v")
      val got = Curation.cusumChangepoint(df, "g", "v", Seq("id"))
        .select("g", "id").as[(String, Long)].collect().toMap
      for ((g, grp) <- rows.groupBy(_._2)) {
        val ordered = grp.sortBy(_._1)
        val mu = ordered.map(_._3).sum / ordered.length
        var c = BigDecimal(0)
        val cus = ordered.map { r =>
          c += BigDecimal(r._3 - mu).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          (r._1, c.abs)
        }
        val peak = cus.maxBy { case (id, a) => (a, -id) }._1
        assert(got(g) == peak, s"seed=$seed group=$g")
      }
    }
  }

  test("madOutliers flags exactly the brute-force outlier set") {
    forEvery(seeds) { seed =>
      val rnd = new Random(seed)
      val rows = (0 until 300).map { i =>
        val base = math.floor(rnd.nextDouble() * 100) / 4
        val v = if (rnd.nextInt(20) == 0) base + 500.0 else base
        (i.toLong, s"g${i % 2}", v)
      }
      val df = rows.toDF("id", "g", "v")
      val got = Curation.madOutliers(df, "g", "v", 3.0)
        .select("id").as[Long].collect().toSet
      val brute = rows.groupBy(_._2).flatMap { case (_, grp) =>
        def med(xs: Seq[Double]) = xs.sorted.apply(((xs.length - 1) * 0.5).floor.toInt)
        val m = med(grp.map(_._3))
        val mad = med(grp.map(r => math.abs(r._3 - m)))
        grp.filter(r => math.abs(r._3 - m) > 3.0 * mad).map(_._1)
      }.toSet
      assert(got == brute, s"seed=$seed")
    }
  }
}
