package graft.functions

import graft.SparkSpec

class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("exact_percentile resolves from SQL text") {
    GraftFunctions.register(spark)
    Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 10.0))
      .toDF("g", "x").createOrReplaceTempView("fx")
    val out = spark.sql(
      "SELECT g, exact_percentile(x, array(0.5D, 1.0D)) AS p FROM fx GROUP BY g ORDER BY g")
      .collect().map(r => r.getString(0) ->
        r.getAs[scala.collection.Seq[Double]]("p").toSeq).toMap
    assert(out("a") == Seq(2.0, 3.0))
    assert(out("b") == Seq(10.0, 10.0))
  }
}
