package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TestFixtureAccess

/** Pins the round-10 harness helpers: the scratch-volume pick and the
  * replay-fixture memo (graft.queries.StreamFixtures.replayRows via the
  * package-private accessor below).
  */
class TempDirsScratchSpec extends AnyFunSuite {

  test("scratchBase is a writable directory and scratch dirs land under it") {
    val base = TempDirs.scratchBase
    assert(base.isDirectory && base.canWrite, s"scratchBase $base")
    val d = TempDirs.scratch(s"graft_spec_scratch_${ProcessHandle.current().pid()}")
    assert(d.getParentFile.getCanonicalFile == base.getCanonicalFile)
    // the env override wins outright; without it /dev/shm needs >= 8 GiB
    if (sys.env.contains("GRAFT_SCRATCH")) {
      assert(base.getPath == sys.env("GRAFT_SCRATCH"))
    } else if (base.getPath == "/dev/shm") {
      assert(base.getUsableSpace >= 8L * 1024 * 1024 * 1024,
        "picked /dev/shm below the capacity floor")
    }
  }

  test("replayRows memoizes per key: same instance back, no rebuild, keys isolated") {
    var builds = 0
    def build(tag: String): Seq[String] = { builds += 1; Seq(tag) }
    val k = s"spec_memo_${System.nanoTime()}"
    val a = TestFixtureAccess.replayRows(k, "dirA")(build("a"))
    val b = TestFixtureAccess.replayRows(k, "dirA")(build("SHOULD NOT BUILD"))
    assert(builds == 1, "second lookup rebuilt the fixture")
    assert(a eq b, "memo returned a different instance")
    // a different sfDir is a different fixture
    val c = TestFixtureAccess.replayRows(k, "dirB")(build("c"))
    assert(builds == 2 && c == Seq("c"))
  }
}
