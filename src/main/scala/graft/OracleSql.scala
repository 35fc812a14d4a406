package graft

/** DuckDB-SQL text generators mirroring [[graft.functions.StableAgg]].
  *
  * Every fragment here must produce the bit-identical double that the
  * corresponding Spark Column produces: exact decimal sums, then the same
  * shape of double arithmetic applied to the exact totals.
  */
object OracleSql {
  def dsum(x: String, scale: Int = 6): String =
    s"CAST(SUM(CAST(($x) AS DECIMAL(38,$scale))) AS DOUBLE)"

  def davg(x: String, scale: Int = 6): String =
    s"(${dsum(x, scale)} / COUNT($x))"

  def dstdSamp(x: String): String = {
    val n  = s"CAST(COUNT($x) AS DOUBLE)"
    val s1 = dsum(x)
    val s2 = s"CAST(SUM(CAST((($x) * ($x)) AS DECIMAL(38,10))) AS DOUBLE)"
    s"(CASE WHEN COUNT($x) <= 1 THEN 0.0 ELSE " +
      s"sqrt(greatest(($s2 - $s1 * $s1 / $n) / ($n - 1.0), 0.0)) END)"
  }

  def lsumD(x: String): String = s"CAST(SUM($x) AS DOUBLE)"

  def lavg(x: String): String = s"(CAST(SUM($x) AS DOUBLE) / COUNT($x))"

  def lstdSamp(x: String): String = {
    val n  = s"CAST(COUNT($x) AS DOUBLE)"
    val s1 = s"CAST(SUM($x) AS DOUBLE)"
    val s2 = s"CAST(SUM(($x) * ($x)) AS DOUBLE)"
    s"(CASE WHEN COUNT($x) <= 1 THEN 0.0 ELSE " +
      s"sqrt(greatest(($s2 - $s1 * $s1 / $n) / ($n - 1.0), 0.0)) END)"
  }
}
