package graft.tools

import graft.GraftSession

/** Dev-only: print each query's parquet ReadSchema lines — evidence that
  * column pruning reaches every scan (a scan reading all columns for a
  * narrow projection is a bug).
  */
object SchemaCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("schema-check", "4")
    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      val plan = df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
      val schemas = plan.linesIterator.filter(_.contains("ReadSchema")).map(_.trim.take(150)).toSeq.distinct
      println(s"[schema] $name\n  " + schemas.mkString("\n  "))
    }
    spark.stop()
  }
}
