package graft.tools

import graft.GraftSession

/** Dev-only: reproduce Bench's warm-at-sf0.001 / time-at-sf0.1 sequence
  * for a subset of queries, to isolate first-run-at-scale overhead and
  * chase bench-variance outliers. Prints per-stage wall/cpu/gc for stages
  * over 1 s (the attribution an outlier sample needs: WHICH stage
  * inflated, and was it CPU or GC).
  */
object ProfileBenchSeq {

  /** Testable core: warm once at `warmDir`, then time two runs at `sfDir`.
    * Returns (warmSec, firstSec, secondSec). */
  def runSeq(spark: org.apache.spark.sql.SparkSession, name: String,
      warmDir: String, sfDir: String): (Double, Double, Double) = {
    val fn = graft.SparkEntry.queries(name)
    val t0 = System.nanoTime()
    fn(spark, warmDir).write.format("noop").mode("overwrite").save()
    val t1 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val t2 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val t3 = System.nanoTime()
    ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("profile-bench-seq", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
        if (wall > 1.0) {
          val m = si.taskMetrics
          System.err.println(f"[stage] id=${si.stageId} wall=$wall%.1fs tasks=${si.numTasks} " +
            f"runMs=${m.executorRunTime} cpuMs=${m.executorCpuTime / 1000000} " +
            f"gcMs=${m.jvmGCTime} spillMB=${m.diskBytesSpilled / 1048576} ${si.name.take(60)}")
        }
      }
    })
    val names = if (args.nonEmpty) args.toSeq else Seq("q16_normalize_books5", "q17_normalize_trades")
    // GRAFT_PROF_WARM / GRAFT_PROF_SF: dev overrides so the same harness
    // drives the sf1/sf10 scale-sanity passes (docs/SCALING.md)
    val warmDir = sys.env.getOrElse("GRAFT_PROF_WARM", "/root/testdata/sf0.001")
    val sfDir = sys.env.getOrElse("GRAFT_PROF_SF", "/root/testdata/sf0.1")
    names.foreach { name =>
      val (w, f1, f2) = runSeq(spark, name, warmDir, sfDir)
      println(f"[seq] $name%-24s warm=$w%.2f first=$f1%.2f second=$f2%.2f ($sfDir)")
    }
    spark.stop()
  }
}
