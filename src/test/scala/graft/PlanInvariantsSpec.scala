package graft

import graft.tools.PlanAudit

/** The asserting half of the plan audit: recomputes every batch query's
  * plan-shape invariant record (exchange/join/scan node counts, pushdown
  * coverage, per-scan ReadSchema) and diffs it against the checked-in
  * golden `docs/plan_invariants.tsv`, so a plan regression — an extra
  * shuffle, a lost PushedFilters, a broadcast→SMJ flip, a widened
  * ReadSchema, a CartesianProduct sneaking in — fails `sbt test` exactly
  * the way a wrong answer fails CORRECTNESS.
  *
  * After an INTENTIONAL plan change, regenerate with
  * `sbt -batch "runMain graft.tools.PlanAudit"` and review the tsv diff —
  * the diff IS the plan-review artifact.
  */
class PlanInvariantsSpec extends SparkSpec {

  private lazy val golden: Map[String, PlanAudit.PlanRecord] =
    PlanAudit.parseTsv(java.nio.file.Files.readString(
      java.nio.file.Paths.get("docs/plan_invariants.tsv")))

  private lazy val current: Map[String, PlanAudit.PlanRecord] =
    PlanAudit.batchQueryNames
      .map(n => n -> PlanAudit.record(spark, n, PlanAudit.invariantSf)).toMap

  test("every batch registry query has a golden plan-invariant record") {
    val missing = PlanAudit.batchQueryNames.filterNot(golden.contains)
    assert(missing.isEmpty,
      s"queries missing from docs/plan_invariants.tsv (regenerate with " +
        s"`sbt \"runMain graft.tools.PlanAudit\"`): ${missing.mkString(", ")}")
    val stale = golden.keys.filterNot(PlanAudit.batchQueryNames.contains).toSeq.sorted
    assert(stale.isEmpty, s"golden records for queries no longer in the registry: ${stale.mkString(", ")}")
  }

  test("plan-shape records match the golden file (no silent plan regressions)") {
    val diffs = PlanAudit.batchQueryNames.flatMap { n =>
      (golden.get(n), current.get(n)) match {
        case (Some(g), Some(c)) if g != c =>
          Some(s"$n:\n  golden : ${g.tsvLine}\n  current: ${c.tsvLine}")
        case _ => None
      }
    }
    assert(diffs.isEmpty,
      s"${diffs.size} plan(s) drifted from docs/plan_invariants.tsv — if " +
        "intentional, regenerate via `sbt \"runMain graft.tools.PlanAudit\"` " +
        "and review the diff:\n" + diffs.mkString("\n"))
  }

  test("no CartesianProduct anywhere; BNLJ only on documented tiny sides") {
    val cart = current.values.filter(_.cartesian > 0).map(_.name).toSeq.sorted
    assert(cart.isEmpty, s"CartesianProduct in: ${cart.mkString(", ")}")
    val badBnlj = current.values
      .filter(r => r.bnlj > 0 && !PlanAudit.bnljAllowed(r.name)).map(_.name).toSeq.sorted
    assert(badBnlj.isEmpty,
      s"BroadcastNestedLoopJoin outside the documented tiny-side allowlist " +
        s"(PlanAudit.bnljAllowed): ${badBnlj.mkString(", ")}")
  }
}
