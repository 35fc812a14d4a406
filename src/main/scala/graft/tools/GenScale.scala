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

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("target/sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = GraftSession.get("graft-genscale", sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))

    def load(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit = {
      df.write.mode(SaveMode.Overwrite).parquet(s"$out/$t.parquet")
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
    write(rep(cust).select(shift("c_custkey", CK) +: cust.columns.filter(_ != "c_custkey").map(col): _*), "customer")

    val sup = load("supplier")
    write(rep(sup).select(shift("s_suppkey", SK) +: sup.columns.filter(_ != "s_suppkey").map(col): _*), "supplier")

    val part = load("part")
    write(rep(part).select(shift("p_partkey", PK) +: part.columns.filter(_ != "p_partkey").map(col): _*), "part")

    val ord = load("orders")
    write(rep(ord).select(shift("o_orderkey", OK), shift("o_custkey", CK),
      col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
      col("o_orderpriority")), "orders")

    val li = load("lineitem")
    write(rep(li).select(shift("l_orderkey", OK), shift("l_partkey", PK),
      shift("l_suppkey", SK), col("l_linenumber"), col("l_quantity"),
      col("l_extendedprice"), col("l_discount"), col("l_tax"),
      col("l_returnflag"), col("l_linestatus"), col("l_shipdate")), "lineitem")

    val ev = load("events")
    write(rep(ev).select(shift("event_id", EV), col("ts"),
      shift("user_id", US), col("event_type"), col("value"), col("props")), "events")

    // word rotation by a copy-dependent offset: rotate(text.split(' '), r)
    val docs = load("documents")
    val rotated = rep(docs)
      .withColumn("__w", split(col("text"), " "))
      .withColumn("__r", (col("__k") * 7 + 1) % greatest(size(col("__w")), lit(1)))
      .withColumn("text", when(col("__k") === 0, col("text")).otherwise(
        concat_ws(" ", concat(slice(col("__w"), col("__r") + 1,
            greatest(size(col("__w")) - col("__r"), lit(0))),
          slice(col("__w"), lit(1), col("__r"))))))
      // n_chars recomputed from the rotated text (identity for strictly
      // single-space-delimited docs; exact for any input) so length-based
      // queries see consistent metadata in the scaled fixture (ADVICE r10).
      .select(shift("doc_id", DOC), col("text"), col("lang"), col("source"),
        length(col("text")).cast("long").as("n_chars"))
    write(rotated, "documents")

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
    write(rotE, "embeddings")

    spark.stop()
    println(s"""{"genscale":"ok","src":"$src","out":"$out","copies":$copies}""")
  }
}
