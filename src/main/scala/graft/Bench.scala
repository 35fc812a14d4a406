package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.get("graft-bench", cpus)

    // Per-query stage attribution via job groups: every stage is credited
    // to the (query, round) job group that launched it, so each bench run
    // ships a stage-level profile (bench_stages.json) that separates plan
    // cost (stage-sum ≈ wall) from driver/planning overhead or host
    // CPU-steal (stage-sum ≪ wall) without a rerun.
    val stageGroup = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    // group -> [stageWallSec, runMs, cpuMs, gcMs, nStages]
    val prof = new java.util.concurrent.ConcurrentHashMap[String, Array[Double]]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val g = Option(j.properties).map(_.getProperty("spark.jobGroup.id")).orNull
        if (g != null) j.stageIds.foreach(sid => stageGroup.put(sid, g))
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val g = stageGroup.get(si.stageId)
        if (g != null) {
          val wall = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
          val m = si.taskMetrics
          prof.compute(g, (_, old) => {
            val a = if (old == null) new Array[Double](5) else old
            a(0) += wall
            a(1) += m.executorRunTime.toDouble
            a(2) += m.executorCpuTime / 1e6
            a(3) += m.jvmGCTime.toDouble
            a(4) += 1
            a
          })
          if (sys.env.contains("GRAFT_BENCH_STAGES") && wall > 2.0)
            System.err.println(f"[stage] id=${si.stageId} group=$g wall=$wall%.1fs " +
              f"runMs=${m.executorRunTime} cpuMs=${m.executorCpuTime / 1000000} " +
              f"gcMs=${m.jvmGCTime}")
        }
      }
    })

    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)

    // Failures must be LOUD: a broken query must never improve the bench.
    // runOnce returns None on any exception; failed queries are excluded
    // from the per-query map and the total, listed under "failed", and the
    // process exits nonzero so no downstream comparison can mistake a
    // 0.05 s analysis error for a speedup (round-6 postmortem).
    val failedQueries = new java.util.concurrent.ConcurrentHashMap[String, String]()
    def runOnce(name: String, fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
        dir: String, tag: String): Option[Double] = {
      spark.sparkContext.setJobGroup(tag, name, interruptOnCancel = false)
      val t0 = System.nanoTime()
      // noop sink forces full materialization of every output column
      // (a bare .count() would let Catalyst prune the computed columns
      // away and under-report the real work).
      try {
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        Some((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        failedQueries.put(name, Option(e.getMessage).getOrElse(e.getClass.getName).take(300))
        None
      }
      finally spark.sparkContext.clearJobGroup()
    }

    // Untimed warmup at the smallest SF only: compiles each query's
    // generated code so timed rounds measure data processing, not one-time
    // codegen. (The former per-query untimed pass at the TARGET SF is
    // dropped — with min-of-3 interleaved rounds below, the first timed
    // round doubles as the JIT warm pass and the min discards it.)
    val sparseSampled = Set("q108_streaming_staleness", "q111_streaming_sessions",
      "q119_streaming_bars", "q120_streaming_dedup", "q121_streaming_metrics",
      "q122_streaming_zero_rates", "q123_streaming_msg_counts",
      "q127_streaming_ann", "q131_streaming_join", "q137_streaming_outer_join",
      "q138_streaming_tws_sessions", "q139_streaming_file_source",
      "q149_streaming_available_now", "q152_streaming_restart",
      "q153_streaming_late_drop", "q154_foreach_batch_sink",
      "q155_streaming_chained_aggs", "q159_stateful_restart")

    val warmDir = {
      val sib = new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.001")
      if (sib.isDirectory) sib.getPath else sfDir
    }
    // The streaming replay gates skip the warmup too: their wall is fixed
    // micro-batch/state-store machinery (bench_stages: stage_wall ≪ wall),
    // so JIT-cold codegen is noise against it and the warmup pass costs
    // 2-4 s of real machinery per gate.
    ordered.foreach { case (name, fn) =>
      if (!sparseSampled(name)) runOnce(name, fn, warmDir, s"$name@w")
    }

    // Min-of-3 timed samples, INTERLEAVED round-robin (JMH-style min):
    // the JVM suffers sporadic time-localized slowdowns (JIT deopt storms,
    // host CPU-steal windows) that can last several seconds — consecutive
    // samples of one query land in the same storm, but samples a full
    // sweep apart don't, so min-per-query across separated rounds measures
    // the steady state a resident cluster session delivers.
    //
    // The streaming-state gates skip the middle round (min-of-2, rounds
    // 0 and 2): their wall is dominated by fixed per-micro-batch
    // state-store latency (bench_stages shows stage_wall ≪ wall), not by
    // any plan under perf scrutiny — a third sample buys no signal and
    // costs ~25 s, while a single round-0 sample reports JIT-cold numbers.
    val nRounds = 3
    val sampleRounds = (0 until nRounds).map { r =>
      ordered.flatMap { case (name, fn) =>
        if (r == 1 && sparseSampled(name)) None
        else runOnce(name, fn, sfDir, s"$name@r$r").map(name -> _)
      }.toMap
    }
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val results = ordered.flatMap { case (name, _) =>
      val times = sampleRounds.flatMap(_.get(name))
      if (times.isEmpty) None
      else {
        val sec = times.min
        System.err.println(s"[bench-q] $name ${f3(sec)} s (samples ${times.map(f3).mkString("/")})")
        Some(name -> sec)
      }
    }
    val failed = failedQueries.keySet().toArray(Array.empty[String]).sorted
    failed.foreach(n => System.err.println(s"[bench-q] $n FAILED: ${failedQueries.get(n)}"))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val json = s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,""" +
      s""""failed":$failedJson,"n_failed":${failed.length},"sf":"$sfDir"}"""

    // Persist full artifacts next to the repo (the captured process tail
    // retains only ~2 KB, which truncates a 109-query map): bench_out.json
    // is the complete result line; bench_stages.json attributes every
    // (query, round) to its stage-level profile so a wall-time delta can
    // be classified as plan change vs host noise in one read.
    try {
      java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_out.json"), json + "\n")
      val stages = ordered.map { case (name, _) =>
        val rounds = (0 until nRounds).flatMap { r =>
          sampleRounds(r).get(name).map { wall =>
            val a = prof.getOrDefault(s"$name@r$r", new Array[Double](5))
            s"""{"wall":${f3(wall)},"stage_wall":${f3(a(0))},""" +
              s""""run_ms":${a(1).toLong},"cpu_ms":${a(2).toLong},"gc_ms":${a(3).toLong},"n_stages":${a(4).toInt}}"""
          }
        }.mkString("[", ",", "]")
        s""""$name":$rounds"""
      }.mkString("{", ",", "}")
      java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_stages.json"), stages + "\n")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] artifact write failed: ${e.getMessage}")
    }

    // The JSON line must be the LAST line of the process's combined output:
    // a consumer that merges stdout+stderr and parses the final line would
    // otherwise trip over Spark's stop/shutdown-hook logging. So: silence
    // all logging, stop Spark (its stop-time log lines are now suppressed),
    // drain stderr, THEN print the JSON.
    org.apache.logging.log4j.core.config.Configurator.setRootLevel(
      org.apache.logging.log4j.Level.OFF)
    spark.stop()
    System.err.flush()
    // Print the full line first (complete-capture consumers), then a
    // compact final line guaranteed to fit a ~2 KB tail capture: the
    // 118-name full map is ~3.2 KB, which truncated every BENCH_r0*.json
    // to parsed:null — the compact line carries the total, the 20
    // slowest queries, and a pointer to bench_out.json for the rest.
    val top = results.sortBy(-_._2).take(20)
      .map { case (k, v) => "\"" + k + "\":" + f3(v) }.mkString("{", ",", "}")
    print(s"\n$json\n")
    print(s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$top,""" +
      s""""queries_truncated":true,"n_queries":${results.size},""" +
      s""""failed":$failedJson,"n_failed":${failed.length},""" +
      s""""queries_file":"bench_out.json","sf":"$sfDir"}\n""")
    System.out.flush()
    // Nonzero rc on any failure: breakage must surface in the driver's
    // BENCH artifact, never masquerade as a fast run.
    if (failed.nonEmpty) sys.exit(1)
  }
}
