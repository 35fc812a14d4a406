package graft.operators

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Certificates for the round-12 queries (sf0.001): whole-result
  * properties and independent recomputes the row-value oracles cannot
  * state (the oracle hash proves WHAT came out; these prove it means what
  * the query claims).
  */
class Round12CertificatesSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  /** Hand-rolled mirror of the library hash chain hexHash32∘md5. */
  private def md5Hash32(x: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(8), 16)
  }

  test("q305: the depth metric discriminates — range layout beats hash scatter") {
    val rows = run("q305_clustering_depth")
      .as[(String, Long, Double, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq("clustered", "scattered"))
    val Array(cl, sc) = rows
    assert(cl._2 == 16 && sc._2 == 16, "both layouts must census 16 files")
    // every probe point is inside its own file's zone → depth ≥ 1; a
    // 16-file layout bounds depth at 16
    Seq(cl, sc).foreach { r =>
      assert(r._3 >= 1.0 && r._4 <= 16, s"depth out of range: $r")
    }
    // the metric's reason to exist: range-clustering must read sharply
    // shallower than the hash scatter on the same data
    assert(cl._3 < sc._3 && cl._4 <= sc._4,
      s"clustering depth failed to discriminate: clustered=$cl scattered=$sc")
  }

  test("q306: the semi/anti cascade partitions events exactly and leaves no requested user behind") {
    val audit = run("q306_erasure_cascade")
      .as[(String, Long, Long, Long, Long)].collect()
    val ev = Tables.events(spark, sf)
    assert(audit.map(_._2).sum == ev.count(), "ledger must cover every row")
    audit.foreach { r =>
      assert(r._2 == r._3 + r._4, s"before != erased + after for $r")
    }
    // independent recompute of the request list via the hand-rolled hash
    val requested = ev.select($"user_id").distinct().as[Long].collect()
      .filter(u => md5Hash32(s"erase:$u") % 20 == 0).toSet
    assert(requested.nonEmpty, "fixture draw must request at least one user")
    // the surviving (anti-joined) table must contain ZERO requested rows
    val survivors = ev.filter(!$"user_id".isin(requested.toSeq: _*))
    assert(survivors.count() == audit.map(_._4).sum,
      "anti-join survivor count disagrees with the ledger")
    val erasedRows = ev.filter($"user_id".isin(requested.toSeq: _*)).count()
    assert(erasedRows == audit.map(_._3).sum,
      "semi-join erased count disagrees with the ledger")
  }

  test("q307: JVM probe hash equals the engine's hexHash32(md5(...)) bit for bit") {
    // the driver-side Bloom probe must compute EXACTLY the bit positions
    // the engine-built index used, or pruning silently breaks at a hash
    // mismatch rather than a Bloom false positive
    val samples = (0 until 50).map(i => s"bf${i % 3}:${i * 7919}")
    val engine = samples.toDF("x")
      .select($"x", Dedup.hexHash32(md5($"x")).as("h"))
      .as[(String, Long)].collect().toMap
    samples.foreach { x =>
      assert(engine(x) == md5Hash32(x), s"hash mismatch for $x")
    }
  }

  test("q307: lookup equals the plain full-scan filter (pruning is invisible in values)") {
    val viaIndex = run("q307_bloom_file_skip")
      .as[(Long, Long, String, Double)].collect().toSeq
    // independent probe derivation + plain scan, no Bloom anywhere
    val ev = Tables.events(spark, sf)
    val probes = ev.select($"event_id").as[Long].collect()
      .filter(id => md5Hash32(s"bfp:$id") % 97 == 0).sorted.take(3)
    val plain = ev.filter($"event_id".isin(probes: _*))
      .select($"event_id", $"user_id", $"event_type", $"value")
      .orderBy("event_id")
      .as[(Long, Long, String, Double)].collect().toSeq
    assert(viaIndex == plain, "Bloom-pruned lookup diverged from full scan")
    assert(viaIndex.nonEmpty, "fixture must yield at least one probe row")
  }

  test("q308: diversity census agrees with q213's QI groups and bounds l by n") {
    val ldiv = run("q308_l_diversity")
      .as[(String, String, Long, Long, Long, Boolean)].collect()
    val kanon = run("q213_k_anonymity")
      .as[(String, String, Long, Long, Boolean)].collect()
      .map(r => ((r._1, r._2, r._3), r._4)).toMap
    assert(ldiv.length == kanon.size, "QI group sets must coincide")
    ldiv.foreach { case (et, day, vb, n, l, diverse) =>
      assert(kanon((et, day, vb)) == n, s"group size disagrees for ($et,$day,$vb)")
      assert(l >= 1 && l <= n, s"l out of [1, n] for ($et,$day,$vb)")
      assert(diverse == (n >= 5 && l >= 3), "release decision formula drifted")
    }
  }

  test("q310: every clause's ledger matches a brute recompute and pass tracks violations") {
    val ledger = run("q310_data_contract")
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(ledger.size == 6, "the contract has exactly six clauses")
    val o = Tables.orders(spark, sf)
      .select("o_orderkey", "o_totalprice", "o_orderdate", "o_orderstatus",
        "o_orderpriority").collect()
    val li = Tables.lineitem(spark, sf).select("l_orderkey")
      .as[Long].collect()
    val nO = o.length.toLong
    // o_orderdate is timestamp_ntz → LocalDateTime in collected rows
    val lo = java.time.LocalDateTime.parse("1992-01-01T00:00:00")
    val hi = java.time.LocalDateTime.parse("1999-01-01T00:00:00")
    val expect = Map(
      "c1_orderkey_unique" ->
        (nO - o.map(_.getLong(0)).distinct.length),
      "c2_totalprice_positive" ->
        o.count(r => r.isNullAt(1) || r.getDouble(1) <= 0.0).toLong,
      "c3_orderdate_domain" ->
        o.count { r =>
          val t = r.getAs[java.time.LocalDateTime](2)
          t.isBefore(lo) || !t.isBefore(hi)
        }.toLong,
      "c4_status_domain" ->
        o.count(r => !Set("F", "O", "P")(r.getString(3))).toLong,
      "c5_priority_format" ->
        o.count(r => !r.getString(4).matches("^[1-5]-.*")).toLong,
      "c6_lineitem_fk" -> {
        val keys = o.map(_.getLong(0)).toSet
        li.count(k => !keys(k)).toLong
      })
    expect.foreach { case (clause, v) =>
      val (checked, violations, pass) = ledger(clause)
      assert(checked == (if (clause == "c6_lineitem_fk") li.length.toLong else nO),
        s"$clause checked-count drifted")
      assert(violations == v, s"$clause violations drifted: got $violations want $v")
      assert(pass == (violations == 0L), s"$clause pass flag drifted")
    }
    // the gate must stay LIVE: the fixture genuinely violates the
    // freshness-domain clause, so a bug that zeroes every counter can't
    // hide behind an all-pass report
    assert(expect("c3_orderdate_domain") > 0, "fixture lost its c3 violations")
  }

  test("q312: dispositions conserve rows and agree with a brute lattice walk") {
    val ledger = run("q312_k_anon_generalize")
      .as[(String, String, Long, Long, Long)].collect()
    val ev = Tables.events(spark, sf)
      .select($"event_type",
        date_format($"ts_utc", "yyyy-MM-dd").as("day"),
        floor($"value" / 10.0d).cast("long").as("b10"))
      .as[(String, String, Long)].collect()
    // conservation: every event lands in exactly one disposition
    assert(ledger.map(r => r._3 + r._4 + r._5).sum == ev.length.toLong,
      "disposition ledger lost or duplicated rows")
    // brute recompute of the generalize-then-suppress walk
    val fine = ev.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expect = scala.collection.mutable.Map
      .empty[(String, String), (Long, Long, Long)].withDefaultValue((0L, 0L, 0L))
    val failing = fine.filter(_._2 < 5)
    fine.filter(_._2 >= 5).foreach { case ((et, day, _), n) =>
      val (f, g, s0) = expect((et, day)); expect((et, day)) = (f + n, g, s0)
    }
    failing.groupBy { case ((et, day, b10), _) =>
      (et, day, math.floor(b10.toDouble / 2.0).toLong)
    }.foreach { case ((et, day, _), members) =>
      val cn = members.values.sum
      val (f, g, s0) = expect((et, day))
      expect((et, day)) =
        if (cn >= 5) (f, g + cn, s0) else (f, g, s0 + cn)
    }
    ledger.foreach { case (et, day, f, g, s0) =>
      assert(expect((et, day)) == ((f, g, s0)),
        s"disposition drifted for ($et,$day)")
    }
    // the lattice must be LIVE on the fixture: all three dispositions occur
    assert(ledger.map(_._3).sum > 0 && ledger.map(_._4).sum > 0 &&
      ledger.map(_._5).sum > 0, "fixture no longer exercises all dispositions")
  }

  test("q311: the streaming erasure's survivor ledger equals q306's batch cascade") {
    // cross-query consistency: the mid-stream retroactive purge must land
    // on exactly the state the batch semi/anti cascade computes in one shot
    val streaming = run("q311_streaming_erasure")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    val batch = run("q306_erasure_cascade")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r._4).toMap // n_after
    assert(streaming.keySet == batch.keySet, "event-type sets diverged")
    streaming.foreach { case (et, n) =>
      assert(batch(et) == n, s"survivor count diverged for $et")
    }
    // and no requested user survived the purge
    val requested = Tables.events(spark, sf).select($"user_id").distinct()
      .as[Long].collect().filter(u => md5Hash32(s"erase:$u") % 20 == 0).toSet
    val survivors = streaming.values.sum
    val expectTotal = Tables.events(spark, sf)
      .filter(!$"user_id".isin(requested.toSeq: _*)).count()
    assert(survivors == expectTotal, "streaming state retained purged rows")
  }

  test("q309: credits balance — one first and one last touch per converting user with a journey") {
    val credits = run("q309_touch_attribution")
      .as[(String, Long, Long)].collect()
    assert(!credits.exists(_._1 == "purchase"),
      "a conversion event can never be its own pre-conversion touchpoint")
    // independent recompute of the crediting population
    val ev = Tables.events(spark, sf)
      .select($"user_id", $"event_type", $"ts_ms", $"event_id")
      .as[(Long, String, Long, Long)].collect()
      .groupBy(_._1)
    val expected = ev.valuesIterator.map { rows =>
      val ordered = rows.sortBy(r => (r._3, r._4)).map(_._2)
      val conv = ordered.indexOf("purchase")
      if (conv > 0) Some((ordered.head, ordered(conv - 1))) else None
    }.flatten.toSeq
    assert(credits.map(_._2).sum == expected.size, "first-touch total drifted")
    assert(credits.map(_._3).sum == expected.size, "last-touch total drifted")
    val firstByType = expected.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val lastByType = expected.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    credits.foreach { case (et, nf, nl) =>
      assert(firstByType.getOrElse(et, 0L) == nf, s"first-touch drifted for $et")
      assert(lastByType.getOrElse(et, 0L) == nl, s"last-touch drifted for $et")
    }
  }

  test("q309: the composite key's lpad widths hold — no silent truncation headroom breach") {
    // q309's event order rides lpad(ts_ms, 13) || lpad(event_id, 10);
    // BOTH Spark and DuckDB lpad silently TRUNCATE longer inputs, so a
    // fixture carrying event_id ≥ 10^10 (or ts_ms ≥ 10^13, year ~2286)
    // would degrade the ordering semantics IDENTICALLY in both engines —
    // invisible to the oracle hash. Pin the width assumption loudly here
    // instead (ADVICE r12): the day a fixture outgrows it, this fails
    // and the pad must widen in query + oracle together.
    // all fixture SFs the driver exercises (correctness sf0.01, bench sf0.1)
    val dirs = Seq("sf0.001", "sf0.01", "sf0.1")
      .map(n => s"/root/testdata/$n")
      .filter(p => new java.io.File(p, "events.parquet").exists())
    assert(dirs.nonEmpty)
    dirs.foreach { d =>
      val bounds = Tables.events(spark, d)
        .agg(max($"event_id").as("max_id"), max($"ts_ms").as("max_ts"),
          min($"event_id").as("min_id"), min($"ts_ms").as("min_ts"))
        .as[(Long, Long, Long, Long)].head()
      assert(bounds._1 < 10000000000L,
        s"$d: event_id ${bounds._1} needs > 10 digits: widen q309's lpad in query AND oracle")
      assert(bounds._2 < 10000000000000L,
        s"$d: ts_ms ${bounds._2} needs > 13 digits: widen q309's lpad in query AND oracle")
      // lpad with '0' also mis-sorts negatives ('-' sorts below digits
      // but not by magnitude): pin non-negativity too
      assert(bounds._3 >= 0L && bounds._4 >= 0L,
        s"$d: negative key values break zero-padded lexicographic ordering")
    }
  }
}
