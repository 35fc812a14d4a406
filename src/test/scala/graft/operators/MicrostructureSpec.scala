package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariant certificates for the round-9 microstructure / robustness
  * families — bounds the estimators must satisfy by construction, checked
  * on the real sf0.001 fixtures (the hash gates pin exact values at
  * sf0.01; these pin the MATH on a second scale).
  */
class MicrostructureSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, sf)

  test("VPIN is a fraction: 0 <= vpin <= 1, and imbalance <= volume per symbol") {
    val rows = run("q227_vpin").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val vpin = r.getAs[Double]("vpin")
      assert(vpin >= 0.0 && vpin <= 1.0, s"vpin out of range: $r")
      assert(r.getAs[Long]("imb_sum") <= r.getAs[Long]("vol_sum"), s"$r")
    }
  }

  test("Roll spread is non-negative and zero when serial covariance is positive") {
    run("q229_roll_spread").collect().foreach { r =>
      val spread = r.getAs[Double]("roll_spread")
      val cov = r.getAs[Double]("serial_cov")
      assert(spread >= 0.0)
      if (cov >= 0.0) assert(spread == 0.0, s"truncation violated: $r")
      else assert(math.abs(spread - 2.0 * math.sqrt(-cov)) <= 1e-12 * (1 + spread))
    }
  }

  test("bipower jump fraction is a fraction; RV and BV are non-negative") {
    run("q230_bipower_jumps").collect().foreach { r =>
      assert(r.getAs[Double]("rv") >= 0.0)
      assert(r.getAs[Double]("bv") >= 0.0)
      if (!r.isNullAt(r.fieldIndex("jump_frac"))) {
        val jf = r.getAs[Double]("jump_frac")
        assert(jf >= 0.0 && jf <= 1.0, s"jump_frac out of range: $r")
      }
    }
  }

  test("correlations are bounded: |xcorr| <= 1 (lead-lag) and |rcorr| <= 1 (matrix)") {
    run("q231_leadlag_xcorr").collect().foreach { r =>
      if (!r.isNullAt(r.fieldIndex("xcorr")))
        assert(math.abs(r.getAs[Double]("xcorr")) <= 1.0 + 1e-12, s"$r")
    }
    val m = run("q243_realized_corr").collect()
    m.foreach { r =>
      assert(r.getAs[String]("sym_a") < r.getAs[String]("sym_b"),
        s"not upper triangle: $r")
      if (!r.isNullAt(r.fieldIndex("rcorr")))
        assert(math.abs(r.getAs[Double]("rcorr")) <= 1.0 + 1e-12, s"$r")
    }
  }

  test("Luhn fold agrees with the textbook algorithm on known numbers") {
    import spark.implicits._
    // 4111111111111111 and 4242424242424242 are canonical valid test
    // PANs; flipping the check digit must invalidate them
    def luhnRef(pan: String): Boolean = {
      val digits = pan.reverse.map(_ - '0')
      digits.zipWithIndex.map { case (d0, i) =>
        if (i % 2 == 1) { val d = d0 * 2; if (d > 9) d - 9 else d } else d0
      }.sum % 10 == 0
    }
    val pans = Seq("4111111111111111", "4242424242424242",
      "4111111111111112", "1234567812345678", "0000000000000000",
      "9999999999999995")
    val digitTerms = sequence(lit(1), lit(16))
    val luhnSum = aggregate(digitTerms, lit(0L), (acc, i) => {
      val dig = col("pan").substr(lit(17) - i, lit(1)).cast("long")
      val term = when(i % 2 === 0,
        when(dig * 2 > 9, dig * 2 - 9).otherwise(dig * 2)).otherwise(dig)
      acc + term
    })
    val got = pans.toDF("pan")
      .withColumn("v", (luhnSum % 10) === 0)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    pans.foreach { p =>
      assert(got(p) == luhnRef(p), s"$p: engine ${got(p)} vs ref ${luhnRef(p)}")
    }
    assert(got("4111111111111111") && !got("4111111111111112"))
  }

  test("MAD outlier census: rates are fractions and outliers obey the 3-MAD rule") {
    run("q234_mad_outliers").collect().foreach { r =>
      val rate = r.getAs[Double]("outlier_rate")
      assert(rate >= 0.0 && rate <= 1.0)
      assert(r.getAs[Double]("mad") >= 0.0)
      assert(r.getAs[Long]("n_outliers") <= r.getAs[Long]("n"))
    }
  }

  test("repetition fractions are bounded and the top 2-gram count is feasible") {
    run("q232_repetition_rules").collect().foreach { r =>
      val n = r.getAs[Int]("n_toks")
      val top = r.getAs[Long]("top2_count")
      assert(top <= math.max(n - 1, 0), s"top2_count impossible: $r")
      val f2 = r.getAs[Double]("top2_frac")
      val f3 = r.getAs[Double]("dup3_frac")
      assert(f2 >= 0.0 && f2 <= 1.0)
      assert(f3 >= 0.0 && f3 <= 1.0)
    }
  }

  test("time-travel snapshots shrink only at the tombstone version") {
    val rows = run("q238_time_travel").collect()
      .map(r => r.getAs[Long]("as_of") -> r.getAs[Long]("n_rows")).toMap
    // ver 0 = all inserts, ver 1 = updates applied (same cardinality),
    // ver 2 = deletes applied (strictly fewer)
    assert(rows(0L) == rows(1L), s"updates changed cardinality: $rows")
    assert(rows(2L) < rows(1L), s"tombstones did not shrink the snapshot: $rows")
  }

  test("vacuum plan never reclaims a file inside the retention horizon") {
    run("q240_vacuum_plan").collect().foreach { r =>
      assert(r.getAs[Long]("n_reclaimable") + r.getAs[Long]("n_held_for_travel")
        <= r.getAs[Long]("n_files"))
    }
  }
}
