package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Core dump loop, parameterized by the registry so the failure contract
    * is testable (VerifyBenchContractSpec): for every query, write the
    * result parquet; on failure write a 1-row `_graft_error` marker parquet
    * instead and record the message. Returns the error map (insertion
    * order). */
  def run(spark: SparkSession, queries: Seq[(String, (SparkSession, String) => DataFrame)],
      sfDir: String, outDir: String): scala.collection.immutable.ListMap[String, String] = {
    new java.io.File(outDir).mkdirs()
    // A failing query must surface as an explicit error entry, never as an
    // absence (round-6 postmortem: 46 erroring queries were silently dropped
    // from CORRECTNESS because no parquet dir existed). On failure we still
    // write outDir/<name> — a 1-row parquet with a `_graft_error` column —
    // so the driver's compare produces a visible schema/hash mismatch for
    // that query, and we record everything in outDir/errors.json.
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
        System.err.println(s"[verify] $name FAILED: $msg")
        errors(name) = msg.take(500)
        try {
          import spark.implicits._
          Seq(msg.take(500)).toDF("_graft_error")
            .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        } catch { case e2: Throwable =>
          System.err.println(s"[verify] $name error-marker write failed: ${e2.getMessage}")
        }
      }
    }
    scala.collection.immutable.ListMap(errors.toSeq: _*)
  }

  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** The oracle_sql.json text — the exact bytes `main` ships to the
    * driver. Exposed so OracleLintSpec can feed the SAME serialization to
    * the DESCRIBE-based dtype lint (tools/check_oracle.py --lint) inside
    * `sbt test`, making an uncast integer aggregate a build failure.
    */
  def oracleSqlJson: String =
    SparkEntry.oracleSql.map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ",", "}")

  /** Write `outDir/errors.json` from the error map (testable half of the
    * loud-failure contract). */
  def writeErrorsJson(outDir: String, errors: collection.Map[String, String]): Unit = {
    val errJson = errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // Dev-only optional 3rd arg: comma-list of query names to dump (the
    // driver always passes exactly 2 args, so its behavior is unchanged).
    val only: Option[Set[String]] = args.drop(2).headOption.map(_.split(",").toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.get("graft-verify", cpus)
    val selected = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val errors = run(spark, selected, sfDir, outDir)
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), oracleSqlJson)
    writeErrorsJson(outDir, errors)
    if (errors.nonEmpty)
      System.err.println(s"[verify] ${errors.size} quer${if (errors.size == 1) "y" else "ies"} FAILED: ${errors.keys.mkString(", ")}")
    spark.stop()
    // Nonzero rc on any failure, matching Bench's contract: the outputs,
    // error-marker parquets, and errors.json are already persisted above, so
    // the driver's compare still runs — but the process exit code now also
    // says "broken" instead of relying solely on the marker compare.
    if (errors.nonEmpty) sys.exit(1)
  }
}
