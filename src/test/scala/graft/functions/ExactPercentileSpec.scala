package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ExactPercentileSpec extends SparkSpec {
  import spark.implicits._

  /** Reference semantics (rolling.py:99-111): sorted[int(p*(n-1))]. */
  private def brute(xs: Seq[Double], p: Double): Double = {
    val s = xs.sorted
    s((p * (s.size - 1)).toInt)
  }

  private def viaSpark(xs: Seq[Double], ps: Seq[Double]): Seq[Double] = {
    val out = xs.toDF("x")
      .agg(ExactPercentile(col("x"), ps).as("p"))
      .collect().head.getAs[scala.collection.Seq[Double]]("p").toSeq
    out
  }

  test("edge counts n=1, n=2, n=20, n=21") {
    for (n <- Seq(1, 2, 20, 21)) {
      val xs = (1 to n).map(_.toDouble * 3.5).reverse
      val got = viaSpark(xs, Seq(0.5, 0.95, 0.99))
      assert(got == Seq(brute(xs, 0.5), brute(xs, 0.95), brute(xs, 0.99)), s"n=$n")
    }
  }

  test("matches brute force on random data (deterministic seed), many sizes") {
    val rnd = new Random(42)
    for (trial <- 1 to 30) {
      val n = 1 + rnd.nextInt(500)
      val xs = Seq.fill(n)(rnd.nextDouble() * 1000 - 500)
      val ps = Seq(0.0, 0.25, 0.5, 0.9, 0.95, 0.99, 1.0)
      assert(viaSpark(xs, ps) == ps.map(p => brute(xs, p)), s"trial=$trial n=$n")
    }
  }

  test("grouped + repartitioned: exact regardless of partitioning") {
    val rnd = new Random(7)
    val rows = (1 to 2000).map(i => (s"g${i % 7}", rnd.nextDouble() * 100))
    val df = rows.toDF("g", "x").repartition(13)
    val got = df.groupBy("g")
      .agg(ExactPercentile(col("x"), Seq(0.5, 0.99)).as("p"))
      .collect().map(r => r.getString(0) -> r.getAs[scala.collection.Seq[Double]]("p").toSeq).toMap
    val expect = rows.groupBy(_._1).map { case (g, vs) =>
      g -> Seq(brute(vs.map(_._2), 0.5), brute(vs.map(_._2), 0.99))
    }
    assert(got == expect)
  }

  test("empty group yields null, nulls in input ignored") {
    val df = Seq[(String, Option[Double])](("a", Some(1.0)), ("a", None), ("b", None))
      .toDF("g", "x")
    val out = df.groupBy("g").agg(ExactPercentile(col("x"), Seq(0.5)).as("p"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("a").get.asInstanceOf[scala.collection.Seq[Double]].toSeq == Seq(1.0))
    assert(out("b").isEmpty)
  }
}
