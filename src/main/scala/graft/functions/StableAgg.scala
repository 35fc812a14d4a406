package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic aggregation helpers.
  *
  * Problem: Spark computes `sum(double)` as partial aggregates merged in a
  * nondeterministic partition order; any other engine (or Spark itself on a
  * different partition count) can disagree in the last ulps. That breaks
  * exact hash-comparison against a single-threaded oracle, and it breaks
  * run-to-run reproducibility at 100 TB where partitioning is dynamic.
  *
  * Fix: route every floating-point summation through exact decimal
  * arithmetic — `sum(cast(x as decimal(38, s)))` is associative and
  * overflow-checked, so the merge order cannot change the result — then
  * cast the exact total back to double once. The per-row double
  * multiplications feeding the sum stay IEEE-deterministic (same inputs →
  * same product on every engine). Costs ~2× vs a raw double sum in the
  * aggregate hot loop, which is noise next to scan+shuffle at scale; use
  * plain `sum` only where bit-reproducibility is explicitly not required.
  *
  * Integer inputs don't need any of this (`sum(long)` is exact); see the
  * `l*` variants.
  *
  * Mirrored SQL-text generators for the DuckDB oracle live in
  * [[graft.OracleSql]].
  */
object StableAgg {
  private val SumScale = 6   // decimal(38,6): 1e31 integer headroom
  private val SqScale  = 10  // squares need more fractional precision

  /** Exact, order-independent sum of a double expression. */
  def dsum(c: Column): Column =
    sum(c.cast(s"decimal(38,$SumScale)")).cast("double")

  /** Exact-sum-based mean (null when no rows). */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Sample standard deviation ((n-1) divisor — matches the reference's
    * rolling std, reference/src/metrics/rolling.py:180) computed from exact
    * decimal sums, with the reference's empty/singleton defaults folded in:
    * 0.0 when n <= 1 (rolling.py:178-196).
    */
  def dstdSamp(c: Column): Column = {
    val n  = count(c).cast("double")
    val s1 = dsum(c)
    val s2 = sum((c * c).cast(s"decimal(38,$SqScale)")).cast("double")
    when(count(c) <= 1, lit(0.0))
      .otherwise(sqrt(greatest((s2 - s1 * s1 / n) / (n - lit(1.0)), lit(0.0))))
  }

  /** Exact integer sum → double (for Long inputs; DuckDB's int128 sum of the
    * same values casts to the identical double).
    */
  def lsumD(c: Column): Column = sum(c).cast("double")

  def lavg(c: Column): Column = sum(c).cast("double") / count(c)

  /** Sample std of an integer column, exact-sum formula, 0.0 when n <= 1. */
  def lstdSamp(c: Column): Column = {
    val n  = count(c).cast("double")
    val s1 = sum(c).cast("double")
    val s2 = sum(c * c).cast("double")
    when(count(c) <= 1, lit(0.0))
      .otherwise(sqrt(greatest((s2 - s1 * s1 / n) / (n - lit(1.0)), lit(0.0))))
  }
}
