package graft.tools

import graft.GraftSession

/** Dev-only: per-stage wall/CPU breakdown for named queries at sf0.1
  * (second run, steady state), stages over 0.2 s.
  */
object StageProf {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("stage-prof", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val names = if (args.nonEmpty) args.toSeq else Seq("q16_normalize_books5")
    @volatile var collect = false
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = if (collect) {
        val si = sc.stageInfo
        val wall = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
        if (wall > 0.2) {
          val m = si.taskMetrics
          System.err.println(f"[stage] id=${si.stageId} wall=$wall%.2fs tasks=${si.numTasks} " +
            f"cpuMs=${m.executorCpuTime / 1000000} " +
            f"shRead=${m.shuffleReadMetrics.totalBytesRead / 1048576}MB " +
            f"shWrite=${m.shuffleWriteMetrics.bytesWritten / 1048576}MB  " +
            si.details.linesIterator.take(1).mkString.take(120))
        }
      }
    })
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
      fn(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
      System.err.println(s"=== $name steady-state run ===")
      collect = true
      val t0 = System.nanoTime()
      fn(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
      System.err.println(f"=== $name total ${(System.nanoTime() - t0) / 1e9}%.2f s ===")
      collect = false
    }
    spark.stop()
  }
}
