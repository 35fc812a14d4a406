package graft.operators

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Structural certificates of the lakehouse operators (sf0.001): the
  * whole-result properties the row-value oracles cannot state.
  */
class LakehouseCertificatesSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q208 streaming compaction equals the batch latest-wins over the same log") {
    // independent batch recompute of latest-wins over the mod-4 key slice
    val o = Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_totalprice")
      .filter($"o_orderkey" % 4 === 0)
    val keys = o.select("o_orderkey").as[Long].collect().toSet
    val expected = keys.flatMap { k =>
      if (k % 11 == 0) None // tombstoned at ver 2 — compacted away
      else if (k % 3 == 0) Some(k -> 1L) // updated at ver 1
      else Some(k -> 0L) // insert only
    }.toMap
    val got = run("q208_streaming_upsert")
      .select("o_orderkey", "ver").as[(Long, Long)].collect()
    assert(got.map(_._1).distinct.length == got.length, "key emitted twice")
    assert(got.toMap == expected)
  }

  test("q209 bucketed-join revenue equals the plain (non-bucketed) join") {
    val plain = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), $"o_custkey" === $"c_custkey")
      .groupBy("c_mktsegment")
      .agg(sum($"o_totalprice".cast("decimal(38,6)")).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy("c_mktsegment")
      .as[(String, Double, Long)].collect().toSeq
    val bucketed = run("q209_bucketed_join")
      .as[(String, Double, Long)].collect().toSeq
    assert(bucketed == plain, "bucketing changed the join result")
  }

  test("q210 zone maps never produce a false negative and partition the row count") {
    val rows = run("q210_zone_map_prune")
      .select("file_id", "n_rows", "keep").as[(Long, Long, Boolean)].collect()
    val li = Tables.lineitem(spark, sf)
    assert(rows.map(_._2).sum == li.count(), "zone maps must cover every row")
    // files with >=1 row actually inside the window MUST be kept (zone-map
    // pruning may keep empty-overlap files, never drop a matching one)
    val mustKeep = li
      .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1998-01-01").cast("timestamp"))
      .select(expr("l_orderkey div 100").as("file_id"))
      .distinct().as[Long].collect().toSet
    val kept = rows.filter(_._3).map(_._1).toSet
    assert(mustKeep.subsetOf(kept),
      s"pruned files containing matching rows: ${(mustKeep -- kept).take(5)}")
  }

  test("q211 validity intervals chain per key and current rows mark live keys") {
    val hist = run("q211_scd2_history")
      .select("o_orderkey", "valid_from", "valid_to", "is_current")
      .as[(Long, Long, Option[Long], Boolean)].collect()
    // per key: intervals form a contiguous chain from ver 0
    hist.groupBy(_._1).foreach { case (k, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.head._2 == 0L, s"key $k history does not start at ver 0")
      sorted.sliding(2).foreach {
        case Array((_, _, to, _), (_, from, _, _)) =>
          assert(to.contains(from), s"key $k has a gap in its interval chain")
        case _ =>
      }
      // only the last row may be current, and only if it is open-ended
      sorted.dropRight(1).foreach(r => assert(!r._4))
      assert(sorted.last._4 == sorted.last._3.isEmpty)
    }
    // exactly the non-tombstoned keys have a current row
    val keys = Tables.orders(spark, sf).select("o_orderkey").as[Long].collect()
    val live = keys.count(_ % 11 != 0)
    assert(hist.count(_._4) == live, "one current row per live key")
  }

  test("q250 layout quality orders hilbert >= zorder >= xsort on probe skips") {
    // sf0.01: with ~23k of 65k grid cells occupied the locality effect is
    // real; at sf0.001 the grid is so sparse (~1.9k cells) that narrow
    // x-stripes prune as well as anything and the ordering is noise
    val skips = SparkEntry.queries("q250_hilbert_layout")(spark, "/root/testdata/sf0.01")
      .select("layout", "n_files", "n_file_probes", "n_skipped")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(skips.keySet == Set("hilbert", "zorder", "xsort"))
    skips.values.foreach { case (l, nf, np, ns) =>
      assert(nf == 64 && np == 64 * 16, s"$l file accounting off: $nf/$np")
      assert(ns >= 0 && ns <= np, s"$l skip count out of range: $ns")
    }
    // the reason Hilbert exists: tighter per-file boxes => at least as
    // much pruning as Z-order, which beats a single-column sort
    assert(skips("hilbert")._4 >= skips("zorder")._4,
      s"hilbert pruned less than zorder: $skips")
    assert(skips("zorder")._4 >= skips("xsort")._4,
      s"zorder pruned less than xsort: $skips")
  }
}
