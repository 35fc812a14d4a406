package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariants for the q89-q96 batch beyond the DuckDB hash gate:
  * top-k group bounds, listagg ordering, island segmentation arithmetic,
  * funnel path determinism, calendar coverage, resample balance bounds,
  * filtered-aggregate consistency, and sweep-line concurrency sanity.
  */
class ExtendedQueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q89 top-k: exactly 3 rows per segment, rank-ordered, balances non-increasing") {
    val rows = q("q89_topk_per_group").collect()
    val perSeg = rows.groupBy(_.getString(0))
    perSeg.foreach { case (seg, rs) =>
      assert(rs.length == 3, s"segment $seg has ${rs.length} rows")
      val sorted = rs.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq == Seq(1, 2, 3), s"ranks wrong for $seg")
      val bals = sorted.map(_.getDouble(2)).toSeq
      assert(bals == bals.sorted.reverse, s"balances not descending for $seg: $bals")
    }
  }

  test("q90 listagg: segments string is sorted, comma-joined, count matches") {
    q("q90_string_agg").collect().foreach { r =>
      val parts = r.getString(1).split(",").toSeq
      assert(parts == parts.sorted, s"unsorted listagg for ${r.getString(0)}")
      assert(parts.distinct.size == parts.size, s"duplicate segment for ${r.getString(0)}")
      assert(parts.size.toLong == r.getLong(2), s"n_segments mismatch: $r")
    }
  }

  test("q91 islands: longest <= n_orders, n_islands <= n_orders, and a hand case segments correctly") {
    q("q91_islands_gaps").collect().foreach { r =>
      assert(r.getLong(2) <= r.getLong(3), s"longest island exceeds order count: $r")
      assert(r.getLong(1) <= r.getLong(3), s"more islands than orders: $r")
      assert(r.getLong(1) >= 1 && r.getLong(2) >= 1)
    }
    // hand case: gaps 10d / 40d / 5d => islands {2 orders}, {2 orders}
    import spark.implicits._
    val hand = Seq(
      (1L, 1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      (1L, 2L, java.sql.Timestamp.valueOf("2024-01-11 00:00:00")),
      (1L, 3L, java.sql.Timestamp.valueOf("2024-02-20 00:00:00")),
      (1L, 4L, java.sql.Timestamp.valueOf("2024-02-25 00:00:00")))
      .toDF("o_custkey", "o_orderkey", "o_orderdate")
    val dir = java.nio.file.Files.createTempDirectory("q91hand").toString
    hand.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = graft.SparkEntry.queries("q91_islands_gaps")(spark, dir).collect()
    assert(r.length == 1 && r.head.getLong(1) == 2 && r.head.getLong(2) == 2 &&
      r.head.getLong(3) == 4, s"hand case wrong: ${r.toSeq}")
  }

  test("q92 funnel: path has n_events tokens, every token a known type, converted consistent with path") {
    val types = Set("view", "click", "purchase", "signup", "error")
    q("q92_funnel_paths").collect().foreach { r =>
      val path = r.getString(2).split(">").toSeq
      assert(path.length.toLong == r.getLong(1), s"token count != n_events: $r")
      assert(path.forall(types.contains), s"unknown event type in path: $r")
      val v = path.indexOf("view"); val p = path.indexOf("purchase")
      val expect = if (v >= 0 && p > v) 1 else 0
      assert(r.getInt(3) == expect, s"converted flag wrong: $r")
    }
  }

  test("q93 calendar profile: dow in 1..7, hod in 0..23, counts sum to table size") {
    val rows = q("q93_dow_hour_profile").collect()
    rows.foreach { r =>
      assert(r.getInt(0) >= 1 && r.getInt(0) <= 7 && r.getInt(1) >= 0 && r.getInt(1) <= 23)
    }
    val total = rows.map(_.getLong(2)).sum
    assert(total == graft.Tables.events(spark, sf).count(), "profile loses events")
  }

  test("q94 resample: every class lands within a factor of 2 of the target; copy indices dense from 1") {
    val rows = q("q94_balanced_resample").collect()
    val perLang = rows.groupBy(_.getString(1)).view.mapValues(_.length.toLong).toMap
    val target = perLang.values.max
    perLang.foreach { case (lang, n) =>
      // floor(target/cnt) replication yields cnt*floor(target/cnt) in (target/2, target]
      assert(n > target / 2 && n <= target, s"$lang resampled to $n vs target $target")
    }
    rows.groupBy(r => r.getLong(0)).foreach { case (doc, rs) =>
      val idx = rs.map(_.getLong(2)).sorted.toSeq
      assert(idx == (1L to idx.length.toLong), s"copy_idx not dense for doc $doc")
    }
  }

  test("q95 filtered aggregates: flags consistent with counts") {
    q("q95_conditional_agg").collect().foreach { r =>
      val nNeg = r.getLong(1)
      assert(r.getBoolean(2) == (nNeg > 0), s"any_neg inconsistent: $r")
      if (r.getBoolean(3)) assert(nNeg == 0, s"all_pos but negatives exist: $r")
      assert(r.getDouble(4) >= 0.0 && r.getDouble(5) <= 0.0)
    }
  }

  test("q97 retention: offset-0 cohort sizes sum to total users; actives never exceed cohort size") {
    val rows = q("q97_cohort_retention").collect()
    val week0 = rows.filter(_.getLong(1) == 0L)
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val totalUsers = graft.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(week0.values.sum == totalUsers, "week-0 cohorts don't partition the user base")
    rows.foreach { r =>
      assert(r.getLong(1) >= 0, s"negative week offset: $r")
      assert(r.getLong(2) <= week0(r.getString(0)),
        s"more active than cohort members: $r")
    }
  }

  test("q98 edit distance: zero iff equal prefixes, bounded by longer prefix, similarity in [0,1]") {
    val rows = q("q98_edit_distance").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dist = r.getInt(2); val sim = r.getDouble(3)
      assert(r.getLong(1) == r.getLong(0) + 1, s"not consecutive: $r")
      assert(dist >= 0 && dist <= 80, s"distance out of bounds: $r")
      assert(sim >= 0.0 && sim <= 1.0, s"similarity out of range: $r")
    }
    // hand case via the registered query over a synthetic table
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q98hand").toString
    Seq((1L, "kitten"), (2L, "sitting")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val hand = graft.SparkEntry.queries("q98_edit_distance")(spark, dir).collect()
    assert(hand.length == 1 && hand.head.getInt(2) == 3, s"kitten/sitting != 3: ${hand.toSeq}")
  }

  test("q99 bit aggregates: and <= every id's bits, or >= them, xor of even multiset cancels") {
    q("q99_bit_aggregates").collect().foreach { r =>
      val or = r.getLong(1); val and = r.getLong(2)
      assert((and & or) == and, s"bit_and not a subset of bit_or: $r")
    }
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q99hand").toString
    // duplicate ids: xor cancels to 0; ts column required by the loader
    Seq((1L, 5L, "a", 1.0), (2L, 5L, "a", 1.0))
      .toDF("event_id", "user_id", "event_type", "value")
      .withColumn("ts", lit(1700000000000000000L))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val hand = graft.SparkEntry.queries("q99_bit_aggregates")(spark, dir).collect()
    assert(hand.head.getLong(3) == 0L, s"xor of duplicate ids not 0: ${hand.toSeq}")
  }

  test("q100 checksum: invariant to input partitioning, counts match the table") {
    val base = q("q100_table_checksum").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val total = graft.Tables.lineitem(spark, sf).count()
    assert(base.map(_._3).sum == total, "checksum group counts lose rows")
    // same data repartitioned: identical checksums (order independence)
    val reshuffled = graft.Tables.lineitem(spark, sf).repartition(7)
    val dir = java.nio.file.Files.createTempDirectory("q100hand").toString
    reshuffled.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val again = graft.SparkEntry.queries("q100_table_checksum")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(base.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq,
      "checksum depends on physical layout")
  }

  test("q101 co-purchase: pairs ordered (a < b), counts descending, at most 20 rows") {
    val rows = q("q101_copurchase_pairs").collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) < r.getLong(1), s"unordered pair: $r"))
    val counts = rows.map(_.getLong(2)).toSeq
    assert(counts == counts.sorted.reverse, "not sorted by count desc")
  }

  test("q102 weighted sample: boundary crossings only, buckets strictly increase per lang") {
    val rows = q("q102_weighted_sample").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(1)).foreach { case (lang, rs) =>
      val buckets = rs.sortBy(_.getLong(0)).map(_.getLong(3)).toSeq
      assert(buckets == buckets.sorted && buckets.distinct.size == buckets.size,
        s"buckets not strictly increasing for $lang: $buckets")
      // stride targets 16 samples; off-by-boundary tolerance
      assert(rs.length >= 1 && rs.length <= 17, s"$lang sampled ${rs.length} docs")
    }
  }

  test("q103 skew report: consistency with a direct recount") {
    val r = q("q103_skew_report").collect().head
    val counts = graft.Tables.lineitem(spark, sf)
      .groupBy("l_partkey").count().collect().map(_.getLong(1))
    assert(r.getLong(0) == counts.length.toLong, "n_keys wrong")
    assert(r.getLong(1) == counts.sum, "n_rows wrong")
    assert(r.getLong(2) == counts.max, "max_cnt wrong")
    val sorted = counts.sorted.map(_.toDouble)
    assert(r.getDouble(3) == sorted((0.5 * (sorted.length - 1)).floor.toInt), "p50 wrong")
    assert(r.getDouble(4) == sorted((0.99 * (sorted.length - 1)).floor.toInt), "p99 wrong")
    assert(r.getDouble(5) == counts.max.toDouble / counts.sum.toDouble, "top1_share wrong")
  }

  test("q104 dup stats: arithmetic identities hold; hand case with a planted duplicate") {
    val r = q("q104_corpus_dup_stats").collect().head
    val (distinct, occ, dup, cross) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(distinct + dup == occ, "distinct + duplicate occurrences != total")
    assert(cross <= distinct && dup >= cross, s"cross-doc bounds violated: $r")
    assert(r.getDouble(4) == dup.toDouble / occ.toDouble)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q104hand").toString
    // "a b c" appears in both docs (cross-doc); "x y z w" adds 2 unique shingles
    Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y z w"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val h = graft.SparkEntry.queries("q104_corpus_dup_stats")(spark, dir).collect().head
    assert((h.getLong(0), h.getLong(1), h.getLong(2), h.getLong(3)) == ((3L, 4L, 1L, 1L)),
      s"hand case wrong: $h")
  }

  test("q105 SCD2: exactly one current row per key; updated keys carry two versions with closed ranges") {
    val rows = q("q105_scd2_merge").collect()
    val perKey = rows.groupBy(_.getLong(0))
    perKey.foreach { case (k, rs) =>
      assert(rs.count(_.getInt(4) == 1) == 1, s"key $k: current-row count != 1")
      val expectedVersions = if (k % 10 == 0) Seq(1, 2) else Seq(1)
      assert(rs.map(_.getInt(2)).sorted.toSeq == expectedVersions, s"key $k versions wrong")
      if (k % 10 == 0) {
        val v1 = rs.find(_.getInt(2) == 1).get
        assert(v1.getInt(3) == 2 && v1.getInt(4) == 0, s"key $k v1 not closed by v2")
        val v2 = rs.find(_.getInt(2) == 2).get
        assert(v2.getDouble(1) == v1.getDouble(1) + 100.0, s"key $k update not applied")
      }
    }
  }

  test("q106 percentile_cont: monotone across probabilities, within [min,max], exact on a hand case") {
    q("q106_percentile_cont").collect().foreach { r =>
      val ps = Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(ps == ps.sorted, s"percentiles not monotone: $r")
    }
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q106hand").toString
    // values 1..4: R-7 p50 = 2.5, p25 = 1.75, p75 = 3.25, p90 = 3.7
    Seq((1L,1L,1L,1,1.0), (2L,1L,1L,1,2.0), (3L,1L,1L,1,3.0), (4L,1L,1L,1,4.0))
      .toDF("l_orderkey","l_partkey","l_suppkey","l_linenumber","l_quantity")
      .withColumn("l_returnflag", lit("A"))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val h = graft.SparkEntry.queries("q106_percentile_cont")(spark, dir).collect().head
    assert((h.getDouble(1), h.getDouble(2), h.getDouble(3), h.getDouble(4)) ==
      ((1.75, 2.5, 3.25, 3.7000000000000002)), s"R-7 hand case wrong: $h")
  }

  test("q96 concurrency: peak >= 1 and <= total events of that type") {
    val totals = graft.Tables.events(spark, sf)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = q("q96_max_concurrency").collect()
    assert(rows.map(_.getString(0)).toSet == totals.keySet)
    rows.foreach { r =>
      assert(r.getLong(1) >= 1 && r.getLong(1) <= totals(r.getString(0)), s"peak out of bounds: $r")
    }
  }
}
