package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import graft.functions.SortedIntersectCount

/** A/B property: under the documented contract (array_sort'ed,
  * array_distinct'ed inputs), `sorted_intersect_count(a, b)` equals
  * `size(array_intersect(a, b))` — the declarative form the q135 oracle
  * semantics mirror — on randomized, adversarial, and edge inputs.
  */
class SetOpsSpec extends SparkSpec {

  private def sic(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    ColumnBridge.column(SortedIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  test("merge-walk intersect count equals size(array_intersect) on random sorted sets") {
    import spark.implicits._
    val rnd = new scala.util.Random(135)
    def randSet(): Seq[String] = {
      val n = rnd.nextInt(40)
      // narrow alphabet forces overlaps; varied lengths exercise binary order
      Seq.fill(n)(rnd.alphanumeric.take(1 + rnd.nextInt(6)).mkString)
    }
    val cases = Seq.tabulate(500)(_ => (randSet(), randSet())) ++ Seq(
      (Seq.empty[String], Seq.empty[String]),
      (Seq.empty[String], Seq("a", "b")),
      (Seq("a", "b", "c"), Seq("a", "b", "c")),
      (Seq("a"), Seq("b")),
      (Seq("", "a"), Seq("", "b")),                 // empty string is a valid element
      (Seq("ab"), Seq("a", "ab", "abc")),
      (Seq("é", "z"), Seq("z", "é")))     // non-ASCII binary order
    val df = cases.toDF("a", "b")
      .select(array_sort(array_distinct(col("a"))).as("a"),
        array_sort(array_distinct(col("b"))).as("b"))
      .withColumn("walk", sic(col("a"), col("b")))
      .withColumn("decl", size(array_intersect(col("a"), col("b"))))
    val bad = df.filter(col("walk") =!= col("decl")).collect()
    assert(bad.isEmpty, s"mismatch on ${bad.length} cases, first: ${bad.headOption}")
  }

  test("long variant: merge-walk equals size(array_intersect) on hashed sets") {
    import spark.implicits._
    val rnd = new scala.util.Random(136)
    def randSet(): Seq[Long] = Seq.fill(rnd.nextInt(50))(rnd.nextInt(64).toLong - 32L)
    val cases = Seq.tabulate(500)(_ => (randSet(), randSet())) ++ Seq(
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(Long.MinValue, -1L, 0L, Long.MaxValue), Seq(Long.MinValue, 0L, 7L)))
    val df = cases.toDF("a", "b")
      .select(array_sort(array_distinct(col("a"))).as("a"),
        array_sort(array_distinct(col("b"))).as("b"))
      .withColumn("walk", sic(col("a"), col("b")))
      .withColumn("decl", size(array_intersect(col("a"), col("b"))))
    val bad = df.filter(col("walk") =!= col("decl")).collect()
    assert(bad.isEmpty, s"mismatch on ${bad.length} cases, first: ${bad.headOption}")
  }

  test("null semantics: null array is null; null elements never match") {
    import spark.implicits._
    val df = Seq((Seq("a", "b"), null: Seq[String])).toDF("a", "b")
      .withColumn("r", sic(col("a"), col("b")))
    assert(df.select("r").collect().head.isNullAt(0))
    // null elements sort last under array_sort and never compare equal
    val withNulls = spark.sql(
      "SELECT sorted_intersect_count(array_sort(array('b', NULL, 'a')), " +
        "array_sort(array('a', NULL))) AS r")
    assert(withNulls.collect().head.getInt(0) == 1)
  }
}
