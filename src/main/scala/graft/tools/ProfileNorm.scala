package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Normalizer
import graft.queries.NormalizerQueries

/** Dev-only: stage-by-stage timing of the normalizer bench queries. */
object ProfileNorm {
  private def time(name: String)(df: => DataFrame): Unit = {
    val d = df
    d.write.format("noop").mode("overwrite").save() // warm
    val t0 = System.nanoTime()
    d.write.format("noop").mode("overwrite").save()
    println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("profile-norm", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")

    val framed = NormalizerQueries.framedBooksPublic(spark, d)
    time("framed(to_json only)")(framed)
    time("framed+cache-ish(count)")(framed.select(col("src_id")))
    time("decode(from_json+filters)")(Normalizer.decode(framed).select(col("msg.arg.instId")))
    val norm = Normalizer.normalize(framed, passthrough = Seq("src_id"))
    time("normalize(full)")(norm)
    time("normalize+project")(
      norm.select(col("src_id"), col("symbol"), col("book.best_bid")))
    time("q16 full (with sort)")(graft.SparkEntry.queries("q16_normalize_books5")(spark, d))
    time("q17 full (with sort)")(graft.SparkEntry.queries("q17_normalize_trades")(spark, d))
    spark.stop()
  }
}
