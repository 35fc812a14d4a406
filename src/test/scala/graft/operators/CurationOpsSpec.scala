package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Round-3 curation operators: chunking, hash sampling, TF-IDF scoring,
  * deterministic shuffle.
  */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("chunkStarts: chunk count and offsets across the size boundary") {
    // n tokens -> expected starts for chunkSize=32, stride=24
    val cases = Seq(
      1  -> Seq(0),
      31 -> Seq(0),
      32 -> Seq(0),
      33 -> Seq(0, 24),          // last chunk short (9 tokens)
      56 -> Seq(0, 24),          // second chunk exactly full
      57 -> Seq(0, 24, 48),
      99 -> Seq(0, 24, 48, 72))
    val got = cases.map(_._1).toDF("n")
      .select(col("n"), TextAnalysis.chunkStarts(col("n"), 32, 24).as("starts"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Int](1).toSeq).toMap
    cases.foreach { case (n, want) => assert(got(n) == want, s"n=$n") }
  }

  test("chunks cover every token: union of spans == doc tokens, stride overlap exact") {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
    val bad = docs
      .select(col("doc_id"), size(col("toks")).as("n"),
        TextAnalysis.chunkStarts(size(col("toks")), 32, 24).as("starts"))
      .filter(
        // last start must reach within chunkSize of the end, and no start may
        // lie beyond the end (empty chunk)
        element_at(col("starts"), -1) + 32 < col("n") ||
        element_at(col("starts"), -1) >= col("n"))
      .count()
    assert(bad == 0L)
  }

  test("stratified sampling: deterministic, rate-respecting, salt-sensitive") {
    val docs = Tables.documents(spark, dir)
    val s1 = Sampling.stratified(docs, col("doc_id"), col("lang"),
      Seq("en" -> 0.25), 1.0, "smp").select("doc_id").collect().map(_.getLong(0)).toSet
    val s2 = Sampling.stratified(docs, col("doc_id"), col("lang"),
      Seq("en" -> 0.25), 1.0, "smp").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1 == s2) // identical decisions on re-run
    val s3 = Sampling.stratified(docs, col("doc_id"), col("lang"),
      Seq("en" -> 0.25), 1.0, "other-salt").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1 != s3) // a fresh salt draws a fresh sample
    // non-en strata keep rate 1.0 -> fully present
    val nonEn = docs.filter(col("lang") =!= "en").count()
    val keptNonEn = Sampling.stratified(docs, col("doc_id"), col("lang"),
      Seq("en" -> 0.25), 1.0, "smp").filter(col("lang") =!= "en").count()
    assert(keptNonEn == nonEn)
    // en keep-rate concentrates near 0.25 (hash uniformity; generous bounds)
    val en = docs.filter(col("lang") === "en").count().toDouble
    val keptEn = Sampling.stratified(docs, col("doc_id"), col("lang"),
      Seq("en" -> 0.25), 1.0, "smp").filter(col("lang") === "en").count().toDouble
    assert(keptEn / en > 0.10 && keptEn / en < 0.45, s"rate=${keptEn / en}")
  }

  test("sampling uniform: [0,1) range and exact reproducibility of the draw") {
    val u = Seq(1L, 2L, 3L).toDF("k")
      .select(Sampling.uniform(col("k"), "s").as("u")).collect().map(_.getDouble(0))
    assert(u.forall(x => x >= 0.0 && x < 1.0))
    assert(u.distinct.length == 3)
  }

  test("tfidf score ranks a doc-specific term above corpus-wide terms") {
    val docs = Seq(
      (1L, "zebra common common common"),
      (2L, "common words only here"),
      (3L, "common words again there")).toDF("doc_id", "text")
    val toks = docs.select(col("doc_id"),
      explode(TextAnalysis.tokens(col("text"))).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = toks.distinct().groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.count()
    val top = tf.join(dfreq, "term")
      .withColumn("score", col("tf").cast("double") * n / col("df"))
      .filter(col("doc_id") === 1L)
      .orderBy(desc("score"), asc("term"))
      .select("term").as[String].collect()
    // zebra: tf=1, df=1 -> 3.0; common: tf=3, df=3 -> 3.0 -> tie broken by term
    assert(top.take(2).toSeq == Seq("common", "zebra"))
    // but a twice-used rare term dominates
    val docs2 = Seq((1L, "zebra zebra common"), (2L, "common x"), (3L, "common y"))
      .toDF("doc_id", "text")
    val toks2 = docs2.select(col("doc_id"),
      explode(TextAnalysis.tokens(col("text"))).as("term"))
    val top2 = toks2.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .join(toks2.distinct().groupBy("term").agg(count(lit(1)).as("df")), "term")
      .withColumn("score", col("tf").cast("double") * lit(3) / col("df"))
      .filter(col("doc_id") === 1L).orderBy(desc("score")).select("term")
      .as[String].collect()
    assert(top2.head == "zebra")
  }

  test("simhash byte-banding recall: every pair with hamming <= 3 is found (pigeonhole)") {
    // 4 bands x 8 bits: <= 3 differing bits cannot touch all 4 bands, so
    // at least one band byte matches and the pair lands in a bucket.
    val docs = Tables.documents(spark, dir)
    val sims = docs
      .select(col("doc_id"), explode(array(
        Dedup.tokenHash32Array(TextAnalysis.tokens(col("text"))))).as("th"))
      .select(col("doc_id"), Dedup.simhash32(col("th")).as("simhash"))
    val a = sims.as("a")
    val b = sims.as("b")
    val brute = a.join(b, col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("x"), col("b.doc_id").as("y"),
        Dedup.hamming64(col("a.simhash"), col("b.simhash")).as("h"))
      .filter(col("h") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bands = sims.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(k => struct(lit(k).as("band_idx"),
        shiftright(col("simhash"), k * 8).bitwiseAND(lit(255L)).as("band_val"))): _*)).as("b"))
      .select(col("doc_id"), col("simhash"), col("b.band_idx"), col("b.band_val"))
    val banded = bands.as("a").join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_val") === col("b.band_val") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("x"), col("b.doc_id").as("y"),
        Dedup.hamming64(col("a.simhash"), col("b.simhash")).as("h"))
      .distinct()
      .filter(col("h") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "fixture has no hamming<=3 pairs - property vacuous")
    assert(banded == brute)
  }

  test("global shuffle: permutation is total, deterministic, and spread over shards") {
    val out = Tables.documents(spark, dir)
      .select(col("doc_id"),
        md5(concat(lit("shuf:"), col("doc_id").cast("string"))).as("shuffle_key"))
      .withColumn("shard", pmod(Dedup.hexHash32(col("shuffle_key")), lit(64L)).cast("int"))
    val n = Tables.documents(spark, dir).count()
    assert(out.select("doc_id").distinct().count() == n)     // total: every doc once
    assert(out.select("shuffle_key").distinct().count() == n) // injective keys
    val shards = out.select("shard").distinct().count()
    assert(shards > 30, s"only $shards shards used") // 50 docs spread over 64 shards
    val a = out.orderBy("shuffle_key").select("doc_id").collect().map(_.getLong(0)).toSeq
    val b = out.orderBy("shuffle_key").select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(a == b && a != a.sorted) // deterministic AND actually permuted
  }
}
