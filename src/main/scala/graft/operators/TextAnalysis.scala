package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over a `documents`
  * table (doc_id, text, ...). All pure column expressions / higher-order
  * functions: per-row computation, no shuffle, fully codegen'd — at 100 TB
  * these run at scan speed and parallelize with input splits.
  */
object TextAnalysis {

  /** Whitespace tokenization (the corpus is single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Word n-gram shingles: ["a","b","c","d"] → n=3 → ["a b c","b c d"].
    * Empty for docs shorter than n words (guarded — `sequence` would
    * otherwise produce a descending range).
    */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Adjacent token pairs as (w1, w2) STRUCTS — the split-free twin of
    * `shingles(toks, 2)` for consumers that need the two tokens, not the
    * joined string (q142's bigram LM): building "w1 w2" only to split it
    * again paid concat + 2× split per bigram. Values are identical to
    * splitting the shingle (tokens contain no spaces by construction of
    * `tokens`). Empty for docs shorter than 2 tokens, like shingles.
    */
  def bigramPairs(toks: Column): Column =
    when(size(toks) >= 2,
      transform(sequence(lit(0), size(toks) - 2),
        i => struct(get(toks, i).as("w1"), get(toks, i + 1).as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))

  /** Apply one learned BPE merge (x, y) → m to a token array: every
    * adjacent occurrence of x followed by y collapses into the single
    * token m. Requires x != y — then no two occurrences can share a
    * token (positions i and i+1 both matching would force x == y), so
    * "merge all matches" equals the tokenizer's greedy left-to-right
    * pass and the result is deterministic on any partitioning. Pure
    * higher-order-function expression (`get` is null-safe at the array
    * edges): per-row, no shuffle, codegen'd — the merge loop's apply
    * step runs at scan speed over a 100 TB corpus.
    */
  def bpeMerge(toks: Column, x: String, y: String, m: String): Column = {
    require(x != y, "bpeMerge requires x != y (overlap-free application)")
    val merged = filter(
      transform(sequence(lit(0), size(toks) - 1), i =>
        when(get(toks, i) === x && get(toks, i + 1) === y, lit(m))
          .when(get(toks, i - 1) === x && get(toks, i) === y,
            lit(null).cast("string"))
          .otherwise(get(toks, i))),
      c => c.isNotNull)
    when(size(toks) >= 2, merged).otherwise(toks)
  }

  /** Tiny deterministic per-language marker lexicons for the n-gram/
    * stopword language-ID heuristic. Public-knowledge function-word lists.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "en" -> Seq("the", "a", "of", "and", "is", "to"),
    "es" -> Seq("el", "la", "de", "y", "es", "no"),
    "fr" -> Seq("le", "la", "de", "et", "est", "ne"))

  /** Language-ID: count marker-token hits per language, predict the argmax
    * (ties broken by lexicon order above — deterministic).
    */
  def langScores(toks: Column): Seq[Column] =
    langMarkers.map { case (lang, words) =>
      size(filter(toks, t => t.isin(words.map(lit): _*)))
        .as(s"score_$lang")
    }

  def langPredict(scoreCols: Seq[String]): Column = {
    // argmax with first-wins tie-break: a fold over CASE comparisons
    val langs = langMarkers.map(_._1)
    var best = lit(langs.head)
    var bestScore = col(scoreCols.head)
    for (i <- 1 until langs.size) {
      val c = col(scoreCols(i))
      best = when(c > bestScore, lit(langs(i))).otherwise(best)
      bestScore = when(c > bestScore, c).otherwise(bestScore)
    }
    best
  }

  /** Quality scoring: length/stopword/word-shape ratios composed into a
    * [0,1] score (heuristics in the spirit of public corpus-quality
    * filters: C4/Gopher-style length + stopword density rules).
    */
  def qualityColumns(text: Column, toks: Column): Seq[Column] = {
    val nWords = size(toks)
    val nChars = length(text)
    val avgWordLen = (nChars - (nWords - 1)).cast("double") / nWords
    val stopHits = size(filter(toks,
      t => t.isin(Seq("the", "a", "of", "and", "is", "to", "in", "that").map(lit): _*)))
    val stopRatio = stopHits.cast("double") / nWords
    val lenScore = least(nWords.cast("double") / 100.0d, lit(1.0))
    val wordLenScore =
      when(avgWordLen >= 3.0 && avgWordLen <= 10.0, lit(1.0)).otherwise(lit(0.0))
    Seq(
      nWords.as("n_words"),
      avgWordLen.as("avg_word_len"),
      stopRatio.as("stopword_ratio"),
      (lenScore * 0.5d + wordLenScore * 0.2d + least(stopRatio * 3.0d, lit(1.0)) * 0.3d)
        .as("quality_score"))
  }

  /** Token counting: exact whitespace tokens, a BPE-ish regex token count
    * (alnum runs — the word-ish pre-tokenization BPE vocabularies split
    * on), and the chars/4 rule-of-thumb estimate.
    */
  def tokenCounts(text: Column, toks: Column): Seq[Column] = Seq(
    size(toks).as("n_ws_tokens"),
    size(regexp_extract_all(text, lit("[a-z0-9]+"), lit(0))).cast("long")
      .as("n_regex_tokens"),
    ceil(length(text).cast("double") / 4.0d).cast("long").as("n_bpe_est"))

  /** Overlapping token-chunk start offsets (the RAG/training chunker):
    * chunks of `chunkSize` tokens every `stride` tokens, last (possibly
    * short) chunk included — k = 1 + ceil(max(n-chunkSize,0)/stride)
    * chunks for an n-token doc (n >= 1). Requires stride <= chunkSize so
    * every start offset lies inside the doc (no empty chunks). Integer
    * values stay far below 2^53, so the double floor-division is exact.
    */
  def chunkStarts(nToks: Column, chunkSize: Int, stride: Int): Column = {
    require(stride <= chunkSize && stride > 0)
    val kMinus1 = ((greatest(nToks - chunkSize, lit(0)) + lit(stride - 1))
      .cast("double") / stride).cast("int")
    transform(sequence(lit(0), kMinus1), i => i * stride)
  }

  /** Document fingerprints: full-content digest + a prefix digest (cheap
    * near-head dedup key), over whitespace-normalized lowercase text.
    */
  def fingerprints(text: Column): Seq[Column] = {
    val norm = lower(trim(text))
    Seq(
      md5(norm).as("fp_full"),
      md5(substring(norm, 1, 64)).as("fp_prefix64"))
  }

  /** Content-defined chunk boundaries (Rabin/gear-CDC family, here with
    * an md5-of-sliding-window boundary test so the rule reproduces in
    * any engine): character position i (1-based, i ≥ w) ends a chunk iff
    * the last hex digit of md5 over the trailing w-char window is '0'
    * (P = 1/16 ⇒ expected chunk ≈ 16 chars); the document end always
    * closes the final chunk. Because boundaries depend only on LOCAL
    * content, an insertion resynchronizes within one window — the
    * property that makes CDC the chunk-level dedup splitter (fixed-size
    * chunking shifts every downstream boundary). Returns chunk-end
    * positions as an array column.
    *
    * Pure Catalyst HOFs over the text column (sequence → filter with an
    * md5-per-position lambda): scan-local, zero shuffle, codegen'd
    * driver loop. O(len·w) hashing per doc is the portability cost of
    * the md5 rule; a production splitter swaps in an O(len) rolling
    * gear hash behind the same column contract.
    */
  /** Per-position hashes of the character k-grams of `text` (the repo's
    * engine-portable md5→32-bit hash; empty array when the text is
    * shorter than one k-gram). Position i (1-based) hashes
    * text[i, i+k-1].
    */
  def kgramHashes(text: Column, k: Int): Column =
    when(length(text) - (k - 1) < 1, array().cast("array<long>"))
      .otherwise(transform(
        sequence(lit(1), greatest(length(text) - (k - 1), lit(1))),
        i => Dedup.hexHash32(md5(text.substr(i, lit(k))))))

  /** Winnowing selection (Schleimer/Wilkerson/Aiken 2003) over a k-gram
    * hash array: in every window of `w` consecutive hashes select the
    * minimum, ties to the RIGHTMOST position; distinct selected
    * positions (1-based into `hs`). Guarantee: two texts sharing a
    * substring of length ≥ k + w − 1 share at least one selected
    * fingerprint hash.
    */
  def winnowSelect(hs: Column, w: Int): Column =
    when(size(hs) < w, array().cast("array<long>"))
      .otherwise(array_distinct(transform(
        sequence(lit(1), greatest(size(hs) - (w - 1), lit(1))),
        j => {
          val win = slice(hs, j, lit(w))
          j - 1 + (lit(w) + 1 - array_position(reverse(win), array_min(win)))
        })))

  /** One-pass native winnowing (the [[winnowSelect]] semantics fused
    * with hashing — see [[graft.functions.WinnowFingerprints]]):
    * array<struct<pos, hash>> of selected fingerprints, ascending,
    * positions 1-based into the k-gram sequence.
    */
  def winnowFingerprints(text: Column, k: Int, w: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.WinnowFingerprints(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text), k, w))

  def cdcChunkEnds(text: Column, w: Int): Column =
    // sequence(a, b) DESCENDS when a > b, so short docs need the guard,
    // not a least(): a doc shorter than one window has no boundary
    // candidates at all.
    when(length(text) < w, array().cast("array<int>"))
      .otherwise(filter(
        sequence(lit(w), length(text)),
        i => md5(text.substr(i - lit(w - 1), lit(w))).substr(32, 1) === lit("0")))
}
