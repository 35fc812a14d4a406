package graft.tools
import graft.GraftSession
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("probe", "32")
    def noop(n: String) = {
      val df = graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.1")
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(s"$n: ${(System.nanoTime() - t0) / 1e9}s")
    }
    noop("q31_fingerprint"); noop("q31_fingerprint")
    noop("q16_normalize_books5"); noop("q16_normalize_books5")
    spark.stop()
  }
}
