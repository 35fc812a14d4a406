package graft

/** Exercises the bench-variance repro harness (tools/ProfileBenchSeq) so
  * the last dev tool has a green gate: the warm/first/second sequence must
  * run a registry query end-to-end and report three positive timings.
  */
class ProfileBenchSeqSpec extends SparkSpec {
  test("runSeq times warm/first/second runs of a registry query") {
    val sf = "/root/testdata/sf0.001"
    val (w, f1, f2) = graft.tools.ProfileBenchSeq.runSeq(
      spark, "q2_filter_project", sf, sf)
    assert(w > 0 && f1 > 0 && f2 > 0)
  }

  test("runSampled applies Bench's resample-on-spread contract to SCALING runs") {
    val sf = "/root/testdata/sf0.001"
    import graft.tools.ProfileBenchSeq.runSampled
    // durations injected per timed-sample index (Bench's fakeClockForTest
    // rationale: pin the logic, not host timing — r13 ADVICE)

    // storm on sample 0, steady state after: one extra sample must cure it
    val cured = runSampled(spark, "q2_filter_project", sf, sf,
      fakeSampleForTest = Some(i => if (i == 0) 2.4 else 0.4))
    assert(cured.samples == Seq(2.4, 0.4, 0.4), cured.toString)
    assert(cured.min == 0.4 && !cured.contaminated && cured.spread <= 1.5)

    // bimodal with no steady state: budget exhausts, flagged contaminated,
    // min stays the honest fast sample
    val bi = runSampled(spark, "q2_filter_project", sf, sf,
      fakeSampleForTest = Some(i => if (i == 0) 0.4 else 2.4))
    assert(bi.samples == Seq(0.4, 2.4, 2.4, 2.4), bi.toString)
    assert(bi.min == 0.4 && bi.contaminated && bi.spread > 1.5)

    // calm host: no extras taken at all
    val calm = runSampled(spark, "q2_filter_project", sf, sf,
      fakeSampleForTest = Some(_ => 0.4))
    assert(calm.samples.size == 2 && !calm.contaminated && calm.spread == 1.0)
  }
}
