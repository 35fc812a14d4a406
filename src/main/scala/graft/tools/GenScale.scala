package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession

/** Deterministic 10× scale-up of the harness fixture (dev tool, NOT part
  * of the engine): reads `/root/testdata/sf0.1` and writes an
  * sf1-equivalent under a local target directory, for the scale-sanity
  * runs recorded in docs/SCALING.md. The driver's fixtures are
  * read-only, so the scale-up synthesizes from them — NO randomness
  * anywhere (a re-run reproduces byte-identical inputs):
  *
  *  - Fact/dim tables replicate 10× with DISJOINT key spaces (every key
  *    column shifts by copy·BASE, BASE a power of ten above the sf0.1
  *    key range), so every join keeps its exact 1:N structure and the
  *    relational queries scale by data volume, not by join blowup.
  *  - `documents` rotates each copy's word sequence by a copy-dependent
  *    offset: length/vocabulary distributions are preserved while
  *    cross-copy shingle overlap is destroyed — replicating texts
  *    verbatim would hand the near-dup/all-pairs queries quadratic
  *    cluster growth and poison the linear-scaling measurement.
  *  - `embeddings` rotates each copy's vector elements (same norms and
  *    coordinate distribution, different directions) for the same
  *    reason applied to ANN: verbatim copies would put 10 exact
  *    duplicates in every neighborhood.
  *  - `events` shifts user/event ids (10× keys, same per-key series
  *    length — windows/state scale by key count, the realistic axis).
  *  - `region`/`nation` stay as-is (true dimensions at every SF).
  *
  * Usage: runMain graft.tools.GenScale [srcDir] [outDir] [copies]
  */
object GenScale {

  /** Skew mode (4th arg "skew"): the adversarial variant of the scaled
    * fixture, modeling the two dominant real-corpus skews the uniform
    * scale-up deliberately rotates away:
    *  - BOILERPLATE: 30 % of documents (doc_id%10 < 3, long docs only)
    *    get their first 20 words replaced by ONE shared paragraph — the
    *    license-header/templated-page pattern that concentrates shingle
    *    mass and produces hot MinHash-band buckets (the 100 TB risk
    *    SCALING.md's LSH row names). The replacement is capped at half
    *    the doc (docs under 40 words keep their text) so pairwise
    *    Jaccard stays below the dedup thresholds — the stress is on the
    *    CANDIDATE/bucket path, where the skew lives, not on a
    *    combinatorial output explosion no engine could represent.
    *  - HOT ENTITY: 30 % of events (event_id%10 < 3) collapse onto one
    *    bot user_id — the per-key window/session skew (q8/q46 family).
    *    30 % of a 1M-event fixture is ~10000× the median user's row count
    *    (the bot-traffic shape); the q46 self-join then has a single key
    *    carrying a quadratic term big enough to trip AQE's 5×-median
    *    skew trigger but small enough to stay a fixture, not a DoS.
    */
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("target/sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val skew = args.lift(3).contains("skew")
    val spark = GraftSession.get("graft-genscale", sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))

    def load(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    // Multi-file output (hash-repartitioned on the table's key — fully
    // deterministic): a single-file single-row-group table reads as ONE
    // mapper, which (a) serializes every scan stage and (b) leaves AQE's
    // skew split with map-output granularity of 1, so it can never fire
    // (the q237 lesson, fixture edition). A 100 TB table is always many
    // files; 16 per table models that at fixture scale.
    def write(df: DataFrame, t: String, key: Option[String] = None): Unit = {
      // Keyless tables write at their natural partitioning (ADVICE r11):
      // defaulting to coalesce(1) is exactly the single-file/single-mapper
      // shape the comment above warns about — fine for today's tiny
      // dimension tables, but a silent trap for any future fact-table
      // call that omits the key.
      val parts = key.map(k => df.repartition(16, col(k))).getOrElse(df)
      parts.write.mode(SaveMode.Overwrite).parquet(s"$out/$t.parquet")
      System.err.println(s"[genscale] wrote $t")
    }

    // one row per copy index; crossJoin replicates deterministically
    val k = spark.range(0, copies).select(col("id").cast("long").as("__k"))
    def rep(df: DataFrame): DataFrame = df.crossJoin(broadcast(k))
    def shift(c: String, base: Long) = (col(c) + col("__k") * base).as(c)

    // key bases: one power of ten above the sf0.1 ranges (orderkey ~6e6,
    // custkey 1.5e5, suppkey 1e4, partkey 2e5, event_id 1e5, user_id 1e4,
    // doc_id 5e3, vec_id 5e3)
    val OK = 100000000L; val CK = 10000000L; val SK = 1000000L
    val PK = 10000000L; val EV = 10000000L; val US = 1000000L
    val DOC = 1000000L; val VEC = 1000000L

    write(load("region"), "region")
    write(load("nation"), "nation")

    val cust = load("customer")
    write(rep(cust).select(shift("c_custkey", CK) +: cust.columns.filter(_ != "c_custkey").map(col): _*), "customer", Some("c_custkey"))

    val sup = load("supplier")
    write(rep(sup).select(shift("s_suppkey", SK) +: sup.columns.filter(_ != "s_suppkey").map(col): _*), "supplier", Some("s_suppkey"))

    val part = load("part")
    write(rep(part).select(shift("p_partkey", PK) +: part.columns.filter(_ != "p_partkey").map(col): _*), "part", Some("p_partkey"))

    val ord = load("orders")
    write(rep(ord).select(shift("o_orderkey", OK), shift("o_custkey", CK),
      col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
      col("o_orderpriority")), "orders", Some("o_orderkey"))

    val li = load("lineitem")
    write(rep(li).select(shift("l_orderkey", OK), shift("l_partkey", PK),
      shift("l_suppkey", SK), col("l_linenumber"), col("l_quantity"),
      col("l_extendedprice"), col("l_discount"), col("l_tax"),
      col("l_returnflag"), col("l_linestatus"), col("l_shipdate")), "lineitem", Some("l_orderkey"))

    val ev = load("events")
    val evScaled = rep(ev).select(shift("event_id", EV), col("ts"),
      shift("user_id", US), col("event_type"), col("value"), col("props"))
    write(
      if (!skew) evScaled
      else evScaled.withColumn("user_id",
        when(col("event_id") % 10 < 3, lit(1L)).otherwise(col("user_id"))),
      "events", Some("event_id"))

    // word rotation by a copy-dependent offset: rotate(text.split(' '), r)
    val docs = load("documents")
    val rotated = rep(docs)
      .withColumn("__w", split(col("text"), " "))
      .withColumn("__r", (col("__k") * 7 + 1) % greatest(size(col("__w")), lit(1)))
      .withColumn("text", when(col("__k") === 0, col("text")).otherwise(
        concat_ws(" ", concat(slice(col("__w"), col("__r") + 1,
            greatest(size(col("__w")) - col("__r"), lit(0))),
          slice(col("__w"), lit(1), col("__r"))))))
      .select(shift("doc_id", DOC), col("text"), col("lang"), col("source"))
    // shared boilerplate paragraph (20 distinct words — the fixture's docs
    // run 10-100 words, median 54): replaces the first 20 words of every
    // third sufficiently-long document in skew mode. Capped at half the
    // doc so pairwise Jaccard stays below the dedup thresholds (~0.3 for
    // a median doc): the stress lands on the candidate/bucket path.
    val boiler = (0 until 20).map(i => s"boilerplate${i}term").mkString(" ")
    val skewed =
      if (!skew) rotated
      else rotated
        .withColumn("__w", split(col("text"), " "))
        .withColumn("text",
          when(col("doc_id") % 10 < 3 && size(col("__w")) >= 40,
            concat_ws(" ", concat(split(lit(boiler), " "),
              slice(col("__w"), lit(21), size(col("__w")) - 20))))
            .otherwise(col("text")))
        .drop("__w")
    // n_chars recomputed from the final text (identity for strictly
    // single-space-delimited docs; exact for any input) so length-based
    // queries see consistent metadata in the scaled fixture (ADVICE r10).
    write(skewed.withColumn("n_chars", length(col("text")).cast("long")), "documents", Some("doc_id"))

    // element rotation: same multiset of coordinates, different direction
    val emb = load("embeddings")
    val dim = size(col("embedding"))
    val rotE = rep(emb)
      .withColumn("__r", (col("__k") * 3 + 1) % greatest(dim, lit(1)))
      .withColumn("embedding", when(col("__k") === 0, col("embedding")).otherwise(
        concat(slice(col("embedding"), col("__r") + 1,
            greatest(dim - col("__r"), lit(0))),
          slice(col("embedding"), lit(1), col("__r")))))
      .select(shift("vec_id", VEC), col("embedding"), col("label"))
    write(rotE, "embeddings", Some("vec_id"))

    spark.stop()
    println(s"""{"genscale":"ok","src":"$src","out":"$out","copies":$copies}""")
  }
}
