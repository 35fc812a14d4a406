package graft.operators

import graft.{SparkEntry, SparkSpec}

/** Structural certificates of the round-8 frontier operators, checked on
  * the sf0.001 fixture (cheap): these are the properties the oracles
  * cannot state directly because they are inequalities over the whole
  * result, not row values.
  */
class FrontierCertificatesSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q173 k-center covering radii are non-increasing after the seed") {
    val radii = run("q173_kcenter_coreset")
      .orderBy("rank").select("radius_sq").as[Double].collect().toSeq
    val afterSeed = radii.drop(1) // rank 1 is the seed with radius 0
    assert(afterSeed == afterSeed.sorted.reverse,
      s"radii not non-increasing: $afterSeed")
    assert(afterSeed.forall(_ > 0.0))
  }

  test("q176 greedy-coverage marginal gains are non-increasing (submodularity)") {
    val gains = run("q176_greedy_coverage")
      .orderBy("rank").select("gain").as[Long].collect().toSeq
    assert(gains == gains.sorted.reverse, s"gains not non-increasing: $gains")
    assert(gains.head > 0L)
  }

  test("q165 labels are <= node id and idempotent under more rounds on a clique-ish graph") {
    val lbl = run("q165_label_propagation")
      .as[(Long, Long)].collect().toMap
    assert(lbl.forall { case (node, l) => l <= node })
    assert(lbl.values.min == lbl.keys.min) // the global min labels itself
  }

  test("q174 quantization reconstruction certificate holds for every vector") {
    val ok = run("q174_int8_quantize").select("recon_ok").as[Boolean].collect()
    assert(ok.nonEmpty && ok.forall(identity))
  }

  test("q167 sketch set-operation bounds hold for every pair") {
    val rows = run("q167_kmv_theta_setops")
      .select("union_ok", "inter_ok").as[(Boolean, Boolean)].collect()
    assert(rows.nonEmpty && rows.forall { case (u, i) => u && i })
  }
}
