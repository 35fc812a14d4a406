package graft.tools

import java.nio.file.{Files, Paths}

import graft.GraftSession

/** Dev-only: dump `explain("formatted")` for named registry queries to
  * `<outDir>/<name>_<suffix>.txt` — the before/after plan evidence the
  * optimization rounds commit under `plans/rNN/`.
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> <query> [query...]
  * The SF is [[PlanAudit.invariantSf]] unless GRAFT_PLANDUMP_SF overrides.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <query>...")
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val names = args.drop(2).toSeq
    val sf = sys.env.getOrElse("GRAFT_PLANDUMP_SF", PlanAudit.invariantSf)
    val spark = GraftSession.get("graft-plandump",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    Files.createDirectories(outDir)
    names.foreach { n =>
      val txt = PlanAudit.planText(spark, n, sf)
      Files.writeString(outDir.resolve(s"${n}_$suffix.txt"), txt)
      System.err.println(s"[plandump] wrote ${n}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
    println(s"""{"plandump":"ok","n":${names.size},"out":"${args(0)}","suffix":"$suffix"}""")
  }
}
