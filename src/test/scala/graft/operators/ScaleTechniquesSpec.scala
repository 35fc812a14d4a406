package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Proofs of the scale techniques the engine relies on: bucketed
  * co-located joins eliminate the join shuffle; salting spreads skewed
  * keys without changing results.
  */
class ScaleTechniquesSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without an exchange on the join key") {
    val o = graft.Tables.orders(spark, "/root/testdata/sf0.001")
    val c = graft.Tables.customer(spark, "/root/testdata/sf0.001")
    o.write.mode("overwrite").bucketBy(8, "o_custkey")
      .sortBy("o_custkey").saveAsTable("orders_b")
    c.write.mode("overwrite").bucketBy(8, "c_custkey")
      .sortBy("c_custkey").saveAsTable("customer_b")
    // disable broadcast so the co-located path is what gets planned
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"),
          col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should be shuffle-free, got:\n$plan")
      assert(joined.count() ==
        o.join(c, o("o_custkey") === c("c_custkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }

  test("salted join spreads a hot key and preserves join results exactly") {
    val probe = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong, i))
      .toDF("k", "payload")   // 90% of rows share key 1 (hot)
    val build = Seq((1L, "hot"), (950L, "cold")).toDF("k", "tag")
    val plain = probe.join(build, Seq("k"))
      .select("k", "payload", "tag").collect().map(_.toString).sorted.toSeq
    val salted = Skew.saltedJoin(probe, build, "k", 8, col("payload"))
      .select("k", "payload", "tag").collect().map(_.toString).sorted.toSeq
    assert(salted == plain)
    assert(salted.size == 901)
  }
}
