package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession

/** Dev-only scratch probe (not part of the library surface). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("probe", "32")
    val d = "/root/testdata/sf0.1"
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(s"$tag: ${(System.nanoTime() - t0) / 1e9}s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    noop(graft.Tables.lineitem(spark, d).select(count(lit(1)))) // warmup
    val framed = graft.queries.NormalizerQueries.framedBooksPublic(spark, d)
    time("synthesis")(noop(framed))
    time("synthesis r2")(noop(framed))
    val decoded = graft.operators.Normalizer.decode(framed)
    time("decode")(noop(decoded.select(col("msg.arg.instId"))))
    time("decode r2")(noop(decoded.select(col("msg.arg.instId"))))
    val norm = graft.operators.Normalizer.normalize(framed, Seq("src_id"))
    time("normalize")(noop(norm))
    time("normalize r2")(noop(norm))
    val full = graft.SparkEntry.queries("q16_normalize_books5")(spark, d)
    time("full q16")(noop(full))
    time("full q16 r2")(noop(full))
    spark.stop()
  }
}
