package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The property that makes content-defined chunking the dedup splitter
  * (q169): boundaries are a pure function of the trailing w-char window,
  * so a prefix edit shifts every boundary by the edit length instead of
  * rewriting them — chunks resynchronize after one window.
  */
class CdcChunkSpec extends SparkSpec {
  import spark.implicits._

  private val w = 8

  private def ends(texts: String*): Seq[Seq[Int]] =
    texts.toDF("text")
      .select(TextAnalysis.cdcChunkEnds(col("text"), w).as("e"))
      .as[Seq[Int]].collect().toSeq

  test("prefix insertion shifts boundaries; suffix append preserves them") {
    val base = "the quick brown fox jumps over the lazy dog " * 8
    val Seq(b, ins, app) = ends(base, "X" + base, base + " and then some trailing tail")
    // prefix edit: every base boundary at p >= w reappears at p+1 (windows
    // covering only old content hash identically); new boundaries can only
    // appear where a window includes the inserted char (p <= w)
    assert(ins.filter(_ > w) == b.map(_ + 1).filter(_ > w))
    // append: boundaries over the original span are untouched
    assert(app.filter(_ <= base.length) == b)
  }

  test("degenerate inputs") {
    val Seq(short, exact) = ends("abc", "abcdefgh")
    assert(short.isEmpty) // below one window: no boundary candidates
    assert(exact.forall(_ == w)) // single window: boundary only at w
  }
}
