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
}
