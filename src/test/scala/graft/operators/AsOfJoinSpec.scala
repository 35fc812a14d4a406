package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("as-of picks latest right row at-or-before each left ts, per key") {
    val left = Seq(
      (1L, "A", 100L, 10.0), (2L, "A", 250L, 20.0), (3L, "A", 50L, 5.0),
      (4L, "B", 100L, 1.0))
      .toDF("event_id", "user_id", "ts_ms", "value")
    val right = Seq(
      ("A", 100L, 99.0, 100L),   // equal ts → visible to left@100 (<= semantics)
      ("A", 200L, 88.0, 101L),
      ("A", 200L, 77.0, 102L),   // duplicate ts → max tie (102) wins
      ("B", 300L, 50.0, 103L))   // after B's only left row → null
      .toDF("user_id", "ts_ms", "value", "event_id")
    val out = AsOfJoin
      .lastValueAsOf(left, right, Seq("user_id"), "ts_ms", Seq("value"), "event_id")
      .select("event_id", "asof_value")
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    assert(out(1L).contains(99.0))   // equal-ts quote visible
    assert(out(2L).contains(77.0))   // latest-by-tie of the 200ms duplicates
    assert(out(3L).isEmpty)          // before any quote
    assert(out(4L).isEmpty)          // B's quote is later
  }

  test("approx sketches stay within tolerance of exact aggregates") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val approx = ev.agg(
      approx_count_distinct(col("user_id")).as("au"),
      percentile_approx(col("value"), lit(0.5), lit(1000)).as("ap50"))
      .collect().head
    val exact = ev.agg(
      countDistinct(col("user_id")).as("u"),
      expr("percentile(value, 0.5)").as("p50")).collect().head
    assert(math.abs(approx.getLong(0) - exact.getLong(0)).toDouble
      / exact.getLong(0) < 0.1)
    assert(math.abs(approx.getDouble(1) - exact.getDouble(1))
      / math.abs(exact.getDouble(1)) < 0.1)
  }
}
