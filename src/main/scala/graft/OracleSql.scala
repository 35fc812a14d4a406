package graft

/** DuckDB-SQL text generators mirroring [[graft.functions.StableAgg]].
  *
  * Every fragment here must produce the bit-identical double that the
  * corresponding Spark Column produces: exact decimal sums, then the same
  * shape of double arithmetic applied to the exact totals.
  */
object OracleSql {
  /** Exact decimal sum → double, hardened against BOTH of DuckDB's sloppy
    * double↔decimal conversion paths (each diverges from Spark by 1 ulp at
    * sufficient magnitude — found at sf0.1 in q12's sum of squares):
    *
    *  - addend quantization: DuckDB's CAST(DOUBLE AS DECIMAL) computes
    *    x·10^scale IN DOUBLE then rounds — a scaled-double error relative
    *    to Spark's exact-value rounding (scala BigDecimal(d) = DECIMAL128
    *    of the exact binary value). `printf('%.{scale+4}f', x)` prints the
    *    exact value correctly rounded with 4 guard digits; the string →
    *    decimal parse then rounds HALF_UP at the target scale exactly like
    *    Java (verified: '0.125'→0.13, '-0.125'→-0.13), so dyadic ties
    *    (printf alone is half-even there) also agree.
    *  - sum → double: DuckDB's DECIMAL→DOUBLE is int128→double then
    *    /10^scale (two roundings); via VARCHAR it is exact digits + one
    *    correctly-rounded string→double, matching BigDecimal.doubleValue
    *    beyond 2^53.
    */
  def dsum(x: String, scale: Int = 6): String =
    s"CAST(CAST(SUM(CAST(printf('%.${scale + 4}f', $x) AS DECIMAL(38,$scale))) AS VARCHAR) AS DOUBLE)"

  /** Windowed twin of [[dsum]]: the same exact decimal sum over a window
    * frame. `over` is the full "(PARTITION BY … ROWS BETWEEN …)" text.
    */
  def dsumOver(x: String, over: String, scale: Int = 6): String =
    s"CAST(CAST(SUM(CAST(printf('%.${scale + 4}f', $x) AS DECIMAL(38,$scale))) OVER $over AS VARCHAR) AS DOUBLE)"

  /** Spark-SQL-dialect twin of [[dsum]] for queries exercising the
    * engine's own SQL surface (q19): Spark's decimal cast is already
    * exact-value based, so the plain form IS the reference semantics.
    */
  def dsumSparkSql(x: String, scale: Int = 6): String =
    s"CAST(SUM(CAST(($x) AS DECIMAL(38,$scale))) AS DOUBLE)"

  def davg(x: String, scale: Int = 6): String =
    s"(${dsum(x, scale)} / COUNT($x))"

  def dstdSamp(x: String): String = {
    val n  = s"CAST(COUNT($x) AS DOUBLE)"
    val s1 = dsum(x)
    val s2 = s"CAST(CAST(SUM(CAST(printf('%.14f', ($x) * ($x)) AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)"
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
