package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: the correctness gate iterates
  * SparkEntry.queries and runs SparkEntry.oracleSql in DuckDB — a name
  * drift or duplicate silently weakens the gate.
  */
class SparkEntrySpec extends AnyFunSuite {

  test("every query has a unique, well-formed name") {
    val names = SparkEntry.queries.keys.toSeq
    assert(names.size == names.distinct.size)
    assert(names.forall(_.matches("q\\d+_[a-z0-9_]+")), names.filterNot(_.matches("q\\d+_[a-z0-9_]+")))
  }

  test("every oracle key names an existing query, and every query carries an oracle") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"orphan oracles: ${os -- qs}")
    // the engine's stated contract this round: FULL oracle coverage
    assert(qs == os, s"rows-only queries (no oracle): ${qs -- os}")
  }

  test("oracle SQL is DuckDB-dialect text, not Spark artifacts") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(!sql.contains("`"), s"$name: backticks are not DuckDB syntax")
      assert(sql.toUpperCase.contains("SELECT"), s"$name: not a query")
    }
  }
}
