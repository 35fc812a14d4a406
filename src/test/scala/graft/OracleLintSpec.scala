package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Build-gate for the oracle-dtype bug class (round-8 postmortem): DuckDB
  * promotes integer SUM/COUNT-arithmetic outputs to HUGEINT (int128),
  * which the driver's dtype-sensitive hash can never match against
  * Spark's BIGINT — the repo convention is `CAST(... AS BIGINT)` on every
  * integer-aggregate output column. That convention shipped broken 5
  * times in one round while its only guard was a manually-run script, so
  * this spec runs the DESCRIBE-based lint (`tools/check_oracle.py
  * --lint`) over the COMPLETE registry serialization (`Verify
  * .oracleSqlJson` — the exact bytes the driver's gate consumes) on every
  * `sbt test`: an intentionally uncast oracle now makes the suite red.
  *
  * DESCRIBE type-checks without executing, so the lint is cheap (~2 s for
  * the full registry) and exact — no regex approximation of SQL scoping.
  * The sf0.001 fixture supplies the table schemas; output dtypes don't
  * depend on scale. Cancels (never silently passes) when the driver-side
  * python/duckdb toolchain is absent — in this harness it is always
  * present.
  */
class OracleLintSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  private def haveToolchain: Boolean =
    try {
      import scala.sys.process._
      Seq("python3", "-c", "import duckdb, json").! == 0
    } catch { case _: Throwable => false }

  test("every oracle's output schema is free of HUGEINT (uncast integer aggregates)") {
    assume(new java.io.File(sfDir).isDirectory, s"fixture $sfDir missing")
    assume(new java.io.File("tools/check_oracle.py").isFile,
      "tools/check_oracle.py not found (cwd is not the repo root)")
    assume(haveToolchain, "python3+duckdb unavailable — lint cannot run here")

    val tmp = Files.createTempDirectory("oracle_lint")
    val jsonPath = tmp.resolve("oracle_sql.json")
    // try/finally so a red lint run doesn't leak the temp dir (ADVICE r10).
    try {
      Files.writeString(jsonPath, Verify.oracleSqlJson)

      import scala.sys.process._
      val out = new StringBuilder
      val rc = Process(Seq("python3", "tools/check_oracle.py", "--lint",
        sfDir, jsonPath.toString))
        .!(ProcessLogger(l => out.append(l).append('\n'),
                         l => out.append(l).append('\n')))
      assert(rc == 0, s"oracle dtype lint failed (rc=$rc):\n${out.toString}")
      // The lint's summary line carries the oracle count — assert it saw the
      // whole registry, so a silently-empty JSON can't fake a green lint.
      val n = SparkEntry.oracleSql.size
      assert(out.toString.contains(s"$n oracles"),
        s"lint did not cover the full registry ($n oracles expected):\n${out.toString}")
    } finally {
      Files.deleteIfExists(jsonPath): Unit
      Files.deleteIfExists(tmp): Unit
    }
  }
}
