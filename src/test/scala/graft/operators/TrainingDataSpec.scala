package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class TrainingDataSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("exact dedup: identical texts collapse to one group keeping min id") {
    val docs = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y z")).toDF("doc_id", "text")
    val groups = Dedup.exactGroups(docs).collect()
    assert(groups.length == 2)
    val dup = groups.find(_.getAs[Long]("n_copies") == 2).get
    assert(dup.getAs[Long]("keep_id") == 1L)
  }

  test("minhash: identical docs share full signature; jaccard-similar docs share some") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "entirely different words in this document here now")).toDF("doc_id", "text")
    val sigs = docs
      .select(col("doc_id"), TextAnalysis.shingles(TextAnalysis.tokens(col("text")), 3).as("sh"))
      .select(col("doc_id") +: Dedup.minhashCols(col("sh"), 6): _*)
      .collect().map(r => r.getLong(0) -> (1 to 6).map(r.getString)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
  }

  test("native MinHashSigs matches the declarative minhashCols bit-for-bit on real docs") {
    val docs = Tables.documents(spark, dir).limit(300)
      .select(col("doc_id"), TextAnalysis.shingles(TextAnalysis.tokens(col("text")), 3).as("sh"))
    val declarative = docs
      .select(col("doc_id") +: Dedup.minhashCols(col("sh"), 6): _*)
      .orderBy("doc_id").collect().toSeq
    val native = docs
      .select(col("doc_id"), Dedup.minhashArray(col("sh"), 6).as("mhs"))
      .select(col("doc_id") +: Dedup.minhashColsFromArray(col("mhs"), 6): _*)
      .orderBy("doc_id").collect().toSeq
    assert(native.nonEmpty && native == declarative)
    // empty shingle set → all-null minima (array_min-of-empty semantics)
    val empty = Seq((9L, Seq.empty[String])).toDF("doc_id", "sh")
      .select(Dedup.minhashArray(col("sh"), 6).as("mhs")).collect().head
    assert(empty.getSeq[String](0).forall(_ == null))
  }

  test("native TokenHash32 matches hexHash32(md5(token)) bit-for-bit on real docs") {
    val docs = Tables.documents(spark, dir).limit(300)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
    val declarative = docs
      .select(col("doc_id"),
        transform(col("toks"), t => Dedup.hexHash32(md5(t))).as("h"))
      .orderBy("doc_id").collect().toSeq
    val native = docs
      .select(col("doc_id"), Dedup.tokenHash32Array(col("toks")).as("h"))
      .orderBy("doc_id").collect().toSeq
    assert(native.nonEmpty && native == declarative)
  }

  test("literal-plane lshBucket matches the per-row md5 formulation") {
    // the pre-r02 in-plan form, kept inline here as the cross-check
    def planeComponentExpr(p: Int, i: org.apache.spark.sql.Column) =
      (Dedup.hexHash32(md5(concat(lit(s"plane$p:"), i.cast("string"))))
        .cast("double") / lit(4294967296.0d)) - lit(0.5d)
    def bucketExpr(vec: org.apache.spark.sql.Column, numPlanes: Int) =
      (0 until numPlanes).map { p =>
        val dot = aggregate(
          zip_with(vec, sequence(lit(0), size(vec) - 1),
            (x, i) => x * planeComponentExpr(p, i)),
          lit(0.0d), (acc, x) => acc + x)
        when(dot >= 0, lit(1L << p)).otherwise(lit(0L))
      }.reduce(_ + _)
    val e = Tables.embeddings(spark, dir).limit(200)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val got = e.select(col("vec_id"),
        Similarity.lshBucket(col("v"), 8).as("b_new"),
        bucketExpr(col("v"), 8).as("b_old"))
      .collect()
    assert(got.nonEmpty && got.forall(r => r.getLong(1) == r.getLong(2)))
  }

  test("jaccard: identity = 1.0, disjoint = 0.0") {
    val df = Seq((Seq("a b c", "b c d"), Seq("a b c", "b c d"), Seq("x y z", "z z z")))
      .toDF("s1", "s2", "s3")
    val r = df.select(
      Dedup.jaccard(col("s1"), col("s2")).as("same"),
      Dedup.jaccard(col("s1"), col("s3")).as("disjoint")).collect().head
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 0.0)
  }

  test("simhash: identical docs equal; hamming distance small for near-identical") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota lambda")).toDF("doc_id", "text")
    val sh = docs
      .select(col("doc_id"), transform(TextAnalysis.tokens(col("text")), t => md5(t)).as("tm"))
      .select(col("doc_id"), transform(col("tm"), h => Dedup.hexHash32(h)).as("th"))
      .select(col("doc_id"), Dedup.simhash32(col("th")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(2L))
    assert(java.lang.Long.bitCount(sh(1L) ^ sh(3L)) <= 16) // near-dup stays close
  }

  test("LSH ANN returns a subset consistent with brute-force ranking") {
    val e = Tables.embeddings(spark, dir)
    val corpus = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries = e.filter(col("vec_id") < 5).select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val brute = Similarity.bruteForceTopK(corpus, queries, 50)
      .select("qid", "neighbor_id", "cos_sim")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Similarity.lshBucketedTopK(corpus, queries, 10)
      .select("qid", "neighbor_id", "cos_sim").collect()
    // every LSH result must carry the exact cosine the brute-force path
    // computes (same expression ⇒ same double) when within brute's top-50
    lsh.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      brute.get(key).foreach(exp => assert(r.getDouble(2) == exp))
    }
  }

  test("duplicate clusters: large-star/small-star finds connected components") {
    // components: {1,2,3,9} (chain 1-2, 2-3, 3-9), {5,6}, singleton pairs absent
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 9L), (5L, 6L))
      .toDF("doc_id_a", "doc_id_b")
    val got = Dedup.duplicateClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("duplicate clusters: chain of diameter 256 converges in O(log n) rounds") {
    // A 257-node path 0-1-2-...-256: min-label propagation needs ~256
    // rounds; the large-star/small-star alternation must land well under
    // 2·log2(n) + c. Also checks edge orientation handling (reversed input
    // pairs) and that every node labels to the component min.
    val pairs = (0L until 256L).map(i => if (i % 2 == 0) (i, i + 1) else (i + 1, i))
      .toDF("doc_id_a", "doc_id_b")
    val (labels, rounds) = Dedup.duplicateClustersWithRounds(pairs)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 257 && got.values.forall(_ == 0L),
      s"labels wrong: ${got.filter(_._2 != 0L).take(5)}")
    assert(rounds <= 20, s"took $rounds rounds for a 257-node chain (expected O(log n))")
  }

  test("IVF ANN with nProbe = nlist is exactly brute force; partial probe is a consistent subset") {
    val e = Tables.embeddings(spark, dir)
    val corpus = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries = e.filter(col("vec_id") < 3).select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val brute = Similarity.bruteForceTopK(corpus, queries, 10)
      .select("qid", "rank", "neighbor_id").collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val ivfFull = Similarity.ivfTopK(corpus, queries, 10, nlist = 8, nProbe = 8)
      .select("qid", "rank", "neighbor_id").collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(ivfFull == brute)
    val bruteCos = Similarity.bruteForceTopK(corpus, queries, 500)
      .select("qid", "neighbor_id", "cos_sim").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ivfPartial = Similarity.ivfTopK(corpus, queries, 10, nlist = 8, nProbe = 2)
      .select("qid", "neighbor_id", "cos_sim").collect()
    ivfPartial.foreach { r =>
      bruteCos.get((r.getLong(0), r.getLong(1)))
        .foreach(exp => assert(r.getDouble(2) == exp))
    }
    // the deterministic sampled quantizer obeys the same anchor
    val sampledFull = Similarity.ivfSampledTopK(corpus, queries, 10, nlist = 8, nProbe = 8)
      .select("qid", "rank", "neighbor_id").collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(sampledFull == brute)
  }

  test("PQ ANN: with every vector a codeword, ADC degrades to exact sqdist ranking") {
    val e = Tables.embeddings(spark, dir)
    val n = 20
    val corpus = e.filter(col("vec_id") < n)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    // codebookK = |corpus| and step 1 ⇒ every vector IS its subspace
    // codeword, so the 4 codes identify the vector and the ADC sum equals
    // the exact subspace-decomposed squared distance
    val pq = Similarity.pqTopK(corpus, queries, 5, m = 4, sub = 16, codebookK = n)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val exact = {
      import org.apache.spark.sql.expressions.Window
      val joined = corpus.crossJoin(queries).filter(col("id") =!= col("qid"))
        .withColumn("d", expr(
          "aggregate(zip_with(cast(vec as array<double>), cast(qvec as array<double>), (x, y) -> (x-y)*(x-y)), 0.0d, (acc, v) -> acc + v)"))
      val w = Window.partitionBy("qid").orderBy(asc("d"), asc("id"))
      joined.withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
        .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rank")) -> r.getAs[Long]("id")).toMap
    }
    assert(pq == exact, s"PQ identity-codebook ranking diverged:\n pq=$pq\n ex=$exact")
  }

  test("Misra-Gries guarantees containment; heavy-hitter top-k is partition-invariant") {
    // local MG: capacity-2 summary of a stream where 'a' dominates must
    // retain 'a' (freq 5 > 9/(2+1)=3)
    val stream = Seq("a", "b", "a", "c", "a", "d", "a", "e", "a")
    val cands = HeavyHitters.misraGries(stream.iterator, 2).toSet
    assert(cands.contains("a"), s"MG lost the dominant item: $cands")

    // distributed: candidates vary with partitioning, the recounted
    // top-k must not
    val toks = Tables.documents(spark, dir)
      .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
    def run(parts: Int) =
      HeavyHitters.topKExact(toks.repartition(parts), "tok", 10, capacity = 64)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val a = run(2)
    val b = run(7)
    assert(a == b, s"top-k changed with partitioning:\n $a\n $b")
    assert(a.size == 10 && a.sliding(2).forall(p => p.head._2 >= p.last._2))
  }

  test("fixed-point PageRank: hub of a star outranks leaves; partition-invariant") {
    // star: hub 0 <-> leaves 1..6 (symmetrized)
    val raw = (1L to 6L).map(i => (0L, i))
    val edges = (raw ++ raw.map(_.swap)).toDF("src", "dst")
    def run(parts: Int) =
      GraphOps.pageRankFixed(edges.repartition(parts), 5)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ranks = run(2)
    assert(ranks.size == 7)
    val hub = ranks(0L)
    (1L to 6L).foreach(i => assert(hub > ranks(i), s"hub $hub <= leaf ${ranks(i)}"))
    // leaves are symmetric — identical ranks, and the iteration is
    // partition-invariant (integer arithmetic has no accumulation order)
    assert((1L to 6L).map(ranks).toSet.size == 1)
    assert(run(5) == ranks)
  }

  test("multimodal feature extraction is deterministic and partition-invariant") {
    val docs = Tables.documents(spark, dir)
    def run(parts: Int) =
      Multimodal.extractFeatures(spark, Multimodal.withMediaColumns(docs).repartition(parts))
        .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(run(2) == run(7))
  }

  test("ImageCodec PNG round-trip is lossless and decode matches the closed form") {
    // local codec check: encode → decode must reproduce the exact pattern
    val bytes = Multimodal.ImageCodec.synthesizePng(42L, 20, 12)
    assert(bytes.length > 8 &&
      (bytes(1) & 0xff) == 'P' && (bytes(2) & 0xff) == 'N' && (bytes(3) & 0xff) == 'G',
      "synthesized payload is not a PNG")
    val d = Multimodal.ImageCodec.decode(bytes)
    assert(d.width == 20 && d.height == 12)
    var expSum = 0L; var expC = 0L
    for (y <- 0 until 12; x <- 0 until 20) {
      val g = Multimodal.ImageCodec.grayAt(42L, x, y)
      expSum += g; expC = (expC * 31 + g) & 0xffffffffL
    }
    assert(d.pixSum == expSum && d.pixChecksum == expC)
    assert(d.meanGray == expSum.toDouble / (20L * 12 * 255).toDouble)

    // distributed path: partition-invariant through the real codec
    val docs = Tables.documents(spark, dir).limit(60)
    def run(parts: Int) =
      Multimodal.decodeImages(Multimodal.synthesizeImages(docs.repartition(parts)))
        .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(run(2) == run(5))
  }

  test("AudioCodec WAV round-trip is lossless and header fields decode") {
    // local codec check: RIFF/WAVE container + exact PCM round-trip
    val bytes = Multimodal.AudioCodec.synthesizeWav(42L, 300)
    assert(bytes.length > 44 &&
      (bytes(0) & 0xff) == 'R' && (bytes(1) & 0xff) == 'I' &&
      (bytes(8) & 0xff) == 'W' && (bytes(9) & 0xff) == 'A',
      "synthesized payload is not a RIFF/WAVE file")
    val d = Multimodal.AudioCodec.decode(bytes)
    assert(d.sampleRate == 8000 && d.channels == 1 && d.bits == 16)
    assert(d.nSamples == 300L)
    var sum = 0L; var abs = 0L; var c = 0L
    for (i <- 0 until 300) {
      val v = Multimodal.AudioCodec.sampleAt(42L, i)
      sum += v; abs += math.abs(v)
      c = (c * 31 + (v + 32768)) & 0xffffffffL
    }
    assert(d.sampleSum == sum && d.absSum == abs && d.sampleChecksum == c,
      "PCM mismatch — endianness or header-offset bug?")
    assert(d.meanAbs == abs.toDouble / (300.0d * 32768.0d))
    // negative samples must survive the round-trip (sign extension check)
    assert((0 until 300).exists(i => Multimodal.AudioCodec.sampleAt(42L, i) < 0))

    // distributed path: partition-invariant through the real codec
    val docs = Tables.documents(spark, dir).limit(60)
    def run(parts: Int) =
      Multimodal.decodeAudio(Multimodal.synthesizeAudio(docs.repartition(parts)))
        .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(run(2) == run(5))
  }

  test("RgbCodec 3-band PNG round-trip is lossless with semantic band order") {
    val bytes = Multimodal.RgbCodec.synthesizePng(7L, 10, 6)
    val d = Multimodal.RgbCodec.decode(bytes)
    assert(d.width == 10 && d.height == 6)
    var sr = 0L; var sg = 0L; var sb = 0L; var c = 0L
    for (y <- 0 until 6; x <- 0 until 10) {
      val r = Multimodal.RgbCodec.rAt(7L, x, y)
      val g = Multimodal.RgbCodec.gAt(7L, x, y)
      val b = Multimodal.RgbCodec.bAt(7L, x, y)
      sr += r; sg += g; sb += b
      c = (c * 31 + r) & 0xffffffffL
      c = (c * 31 + g) & 0xffffffffL
      c = (c * 31 + b) & 0xffffffffL
    }
    assert(d.sumR == sr && d.sumG == sg && d.sumB == sb)
    assert(d.pixChecksum == c, "interleaved checksum mismatch — band order?")
  }

  test("multimodal resize and frame-sample plans are deterministic metadata") {
    val docs = Tables.documents(spark, dir).limit(10)
    val media = Multimodal.withMediaColumns(docs)
      .withColumn("declared_frames", (col("doc_id") % 20 + 1).cast("int"))
    val planned = Multimodal.withFrameSamplePlan(
      Multimodal.withResizePlan(media, 32, 32), "declared_frames", 3, 4)
    val r = planned.orderBy("doc_id").select(
      col("doc_id"), col("media_meta.declared_width"),
      col("resize_plan.target_width"), col("resize_plan.needs_resize"),
      col("frame_sample_plan")).collect()
    r.foreach { row =>
      assert(row.getInt(2) <= 32)
      val frames = row.getAs[scala.collection.Seq[Int]]("frame_sample_plan")
      assert(frames.size <= 4)
      assert(frames.zipWithIndex.forall { case (f, i) => f == i * 3 })
    }
    // doc 0: declared 16x16 → no resize; doc 9: 25x25 → no; larger widths resize
    val wide = r.find(_.getInt(1) > 32)
    wide.foreach(row => assert(row.getBoolean(3)))
  }

  test("bpeMerge: merges every non-overlapping occurrence, edge-safe") {
    val docs = Seq(
      (1L, Seq("a", "b", "c")),          // interior match
      (2L, Seq("a", "b", "a", "b")),     // repeated match, both merge
      (3L, Seq("b", "a", "b", "b")),     // match not at start; trailing b kept
      (4L, Seq("a")),                    // shorter than a pair — unchanged
      (5L, Seq.empty[String]),           // empty — unchanged
      (6L, Seq("x", "a", "y", "b"))      // no adjacency — unchanged
    ).toDF("doc_id", "toks")
    val out = docs
      .select(col("doc_id"), TextAnalysis.bpeMerge(col("toks"), "a", "b", "a_b").as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) == Seq("a_b", "c"))
    assert(out(2L) == Seq("a_b", "a_b"))
    assert(out(3L) == Seq("b", "a_b", "b"))
    assert(out(4L) == Seq("a"))
    assert(out(5L) == Seq.empty[String])
    assert(out(6L) == Seq("x", "a", "y", "b"))
    // x == y is rejected: overlap-free application cannot be guaranteed
    intercept[IllegalArgumentException] {
      TextAnalysis.bpeMerge(col("toks"), "a", "a", "a_a")
    }
  }

  test("bpeMerge equals sequential greedy left-to-right merge on random corpora") {
    // the q126 determinism claim: for x != y, "merge every match" (the
    // distributed, partition-order-free form) == the tokenizer's
    // sequential greedy pass — exercised over adversarial alternations
    // like [a b a b], [a a b b], [b a b b] from a 3-token alphabet
    def greedy(toks: Seq[String], x: String, y: String, m: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer[String]()
      var i = 0
      while (i < toks.length) {
        if (i + 1 < toks.length && toks(i) == x && toks(i + 1) == y) { out += m; i += 2 }
        else { out += toks(i); i += 1 }
      }
      out.toSeq
    }
    val rnd = new scala.util.Random(42)
    val alphabet = Vector("a", "b", "c")
    val docs = (1 to 300).map { id =>
      (id.toLong, Seq.fill(rnd.nextInt(14))(alphabet(rnd.nextInt(3))))
    }
    val expected = docs.map { case (id, t) => id -> greedy(t, "a", "b", "a_b") }.toMap
    val got = docs.toDF("doc_id", "toks")
      .select(col("doc_id"), TextAnalysis.bpeMerge(col("toks"), "a", "b", "a_b").as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got == expected)
  }

  test("language-ID picks the lexicon with most marker hits") {
    val docs = Seq(
      (1L, "der hund und die katze ist nicht hier"),
      (2L, "the cat and the dog is a friend of mine"),
      (3L, "el perro y la casa es de madera no si")).toDF("doc_id", "text")
    val scoreNames = TextAnalysis.langMarkers.map { case (l, _) => s"score_$l" }
    val out = docs
      .select(col("doc_id") +: TextAnalysis.langScores(TextAnalysis.tokens(col("text"))): _*)
      .withColumn("predicted_lang", TextAnalysis.langPredict(scoreNames))
      .collect().map(r => r.getLong(0) -> r.getAs[String]("predicted_lang")).toMap
    assert(out == Map(1L -> "de", 2L -> "en", 3L -> "es"))
  }

  test("q218 span corruption: accounting identities and artifact round-trip") {
    val rows = graft.SparkEntry.queries("q218_span_corruption")(spark, dir)
      .select("n_tokens", "n_masked", "n_spans", "corrupted_text", "target_text")
      .as[(Long, Long, Long, String, String)].collect()
    assert(rows.nonEmpty)
    val rate = rows.map(_._2).sum.toDouble / rows.map(_._1).sum
    assert(rate > 0.10 && rate < 0.20, s"mask rate $rate far from 15%")
    rows.foreach { case (n, m, sp, corr, tgt) =>
      assert(sp <= m && (m == 0L || sp >= 1L))
      val corrToks = if (corr.isEmpty) 0 else corr.split(" ").length
      val tgtToks = if (tgt.isEmpty) 0 else tgt.split(" ").length
      // corrupted = unmasked tokens + one sentinel per span; target = masked
      assert(corrToks == n - m + sp, s"corrupted length $corrToks != $n-$m+$sp")
      assert(tgtToks == m)
      // fixture-dependent: valid because no harness document contains a
      // literal '<X>' token (the oracle counts span_start flags, which
      // stay correct even when one does)
      assert(corr.split(" ").count(_ == "<X>") == sp)
    }
  }
}
