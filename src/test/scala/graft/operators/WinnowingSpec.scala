package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Winnowing's paper guarantees (q175): any shared substring of length
  * ≥ k + w − 1 yields a shared selected fingerprint, and selection
  * density is bounded.
  */
class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  private val k = 5; private val w = 4

  private def fingerprints(texts: String*): Seq[Set[Long]] =
    texts.toDF("text")
      .withColumn("hs", TextAnalysis.kgramHashes(col("text"), k))
      .select(transform(TextAnalysis.winnowSelect(col("hs"), w),
        p => element_at(col("hs"), p.cast("int"))).as("f"))
      .as[Seq[Long]].collect().toSeq.map(_.toSet)

  test("shared substring of length >= k+w-1 shares a fingerprint") {
    val shared = "zqxjkvwpy" // 9 = k + w chars, distinctive
    val rnd = new scala.util.Random(11)
    def noise(n: Int) = Seq.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
    for (_ <- 1 to 20) {
      val Seq(fa, fb) = fingerprints(
        noise(30) + shared + noise(25), noise(40) + shared + noise(10))
      assert((fa intersect fb).nonEmpty)
    }
  }

  test("selection is dense enough and positions are windows' minima") {
    val text = "the quick brown fox jumps over the lazy dog and keeps going"
    val Seq(row) = Seq(text).toDF("text")
      .withColumn("hs", TextAnalysis.kgramHashes(col("text"), k))
      .withColumn("sel", TextAnalysis.winnowSelect(col("hs"), w))
      .select(col("hs"), col("sel")).as[(Seq[Long], Seq[Long])].collect().toSeq
    val (hs, sel) = row
    assert(hs.length == text.length - (k - 1))
    // every window [j, j+w-1] must contain a selected position
    for (j <- 1 to hs.length - (w - 1))
      assert(sel.exists(p => p >= j && p < j + w))
    // each selected position is the rightmost minimum of some window
    sel.foreach { p =>
      val covering = (math.max(1, p - (w - 1)).toInt to
        math.min(p.toInt, hs.length - (w - 1)))
      assert(covering.exists { j =>
        val win = hs.slice(j - 1, j - 1 + w)
        win.min == hs(p.toInt - 1) && !win.drop((p - j).toInt + 1).contains(win.min)
      })
    }
  }

  test("short texts yield no fingerprints, not errors") {
    assert(fingerprints("abc", "abcdefg").forall(_.isEmpty))
  }

  test("native one-pass expression equals the declarative winnow chain") {
    val rnd = new scala.util.Random(23)
    def noise(n: Int) =
      Seq.fill(n)("abcde" (rnd.nextInt(5))).mkString // heavy hash ties
    val texts = Seq("", "abc", "abcdefg", "abcdefgh", "aaaaaaaaaaaaaaaa",
      "héllo wörld ünïcode padded out to length", // multi-byte path
      "the quick brown fox jumps over the lazy dog") ++
      (1 to 40).map(_ => noise(10 + rnd.nextInt(120)))
    val df = texts.toDF("text")
      .withColumn("hs", TextAnalysis.kgramHashes(col("text"), k))
      .withColumn("sel", TextAnalysis.winnowSelect(col("hs"), w))
      .withColumn("fp", TextAnalysis.winnowFingerprints(col("text"), k, w))
      .select(
        col("sel"),
        transform(col("sel"), p => element_at(col("hs"), p.cast("int")))
          .as("selh"),
        transform(col("fp"), x => x.getField("pos")).as("fpp"),
        transform(col("fp"), x => x.getField("hash")).as("fph"))
      .as[(Seq[Long], Seq[Long], Seq[Long], Seq[Long])].collect()
    df.foreach { case (sel, selh, fpp, fph) =>
      // declarative array_distinct preserves first-occurrence order and
      // the deque emits ascending — both must be the SAME sequence
      assert(fpp == sel, s"positions: native $fpp vs declarative $sel")
      assert(fph == selh, s"hashes: native $fph vs declarative $selh")
    }
  }
}
