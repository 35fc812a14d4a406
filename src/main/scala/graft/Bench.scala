package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}

object Bench {
  type QueryFn = (SparkSession, String) => DataFrame

  /** Outcome of a full warmup+timed sampling pass.
    *
    * The failure taxonomy keeps three distinct buckets so a broken query can
    * never improve the bench (round-6 postmortem) while a flaky-but-
    * measurable one still reports an honest min:
    *  - `failed`: zero successful timed samples — excluded from `results`
    *    and the total, forces a nonzero exit;
    *  - `flaky`: failed ≥1 timed round but has ≥1 successful sample — its
    *    min is real, but the run still exits nonzero so the breakage
    *    surfaces in the driver artifact;
    *  - `warmupOnly`: failed only the untimed sf0.001 warmup pass — reported
    *    but does not fail the run (every timed number behind the totals is
    *    real).
    *
    * Contamination accounting (round-13: the r12 artifact recorded q41 at
    * 5.7× its real wall because all three samples straddled a host storm —
    * 170/312 queries had spread >1.5 in one run):
    *  - `resampled`: queries whose initial samples spread wider than the
    *    bound and earned extra timed samples;
    *  - `contaminated`: queries STILL wider than the bound after the extra
    *    samples — their min is the honest floor of every sample taken, but
    *    the artifact flags that no storm-free steady state was observed;
    *  - `resampleFailed`: queries that errored during a contamination-
    *    handling EXTRA round (r13 ADVICE). Kept OUT of `flaky`/`failed`
    *    and out of the exit-code gate: every pinned `nRounds` sample
    *    passed, so the query's min is as real as the pre-r13 contract
    *    ever required — a storm must not be able to fail a bench run by
    *    merely triggering resampling. Reported alongside `contaminated`
    *    so the artifact still shows the extra sample was attempted;
    *  - `spreadWindow`: the reported `spread` is max/min over each query's
    *    FASTEST `spreadWindow` samples, so a cured query's storm samples
    *    stop polluting the stability column while its min (all samples)
    *    is unchanged. Non-resampled queries have ≤ `spreadWindow` samples,
    *    so their spread semantics are exactly the pre-r13 max/min.
    */
  final case class Run(
      sampleRounds: IndexedSeq[Map[String, Double]],
      results: Seq[(String, Double)],
      failed: Array[String],
      flaky: Array[String],
      warmupOnly: Array[String],
      timedFailed: Map[String, String],
      warmupFailed: Map[String, String],
      resampled: Array[String] = Array.empty,
      contaminated: Array[String] = Array.empty,
      resampleFailed: Map[String, String] = Map.empty,
      spreadWindow: Int = Int.MaxValue,
      spreadBound: Double = 1.5)

  def exitCode(r: Run): Int = if (r.failed.nonEmpty || r.flaky.nonEmpty) 1 else 0

  /** Time-indexed (query, round) tags of the bench samples — the
    * attribution fallback for jobs whose group was replaced by another
    * thread (streaming micro-batches run on the stream-execution thread
    * under the stream's runId group). Keyed by wall-clock START of each
    * sample and resolved against `SparkListenerJobStart.time` (stamped
    * synchronously at job SUBMISSION on the driver), not against a
    * mutable "current" tag read at listener-processing time: the listener
    * bus is async, so a late-delivered JobStart from query N would read
    * query N+1's tag and re-create exactly the misattribution this
    * fallback exists to fix. Sound because `sample` runs queries strictly
    * sequentially, so floorEntry(jobSubmitTime) is the sample that
    * submitted the job; entries ending a sample map to null.
    */
  private val tagWindows =
    new java.util.concurrent.ConcurrentSkipListMap[Long, String]()

  /** Strictly-increasing window keys: System.currentTimeMillis() has ms
    * granularity, so a sample's end-marker put and the next sample's start
    * put can land in the same millisecond — the start would overwrite the
    * end marker and a job whose submit time equals that key could resolve
    * to the wrong sample. max(now, last+1) keeps every window a
    * well-formed half-open interval at a ≤1 ms skew per collision.
    */
  private val lastTagKey = new java.util.concurrent.atomic.AtomicLong(0L)
  private def tagPut(tag: String): Unit = {
    val k = lastTagKey.updateAndGet(prev =>
      math.max(System.currentTimeMillis(), prev + 1))
    tagWindows.put(k, tag): Unit
  }

  private def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)

  /** max/min over the FASTEST `window` samples (all of them when the query
    * has ≤ `window`). Guarded: a zero/NaN sample would render as
    * Infinity/NaN, which is not valid JSON and would break every
    * downstream consumer — report 1.0 (single-sample semantics) instead.
    */
  private[graft] def windowSpread(times: Seq[Double], window: Int): Double = {
    if (times.size < 2) return 1.0
    val w = times.sorted.take(math.min(times.size, math.max(2, window)))
    val ratio = if (w.head <= 0) 1.0 else w.last / w.head
    if (ratio.isNaN || ratio.isInfinite) 1.0 else ratio
  }
  private def names(a: Array[String]): String =
    a.map("\"" + _ + "\"").mkString("[", ",", "]")

  /** The full bench_out.json line (testable: VerifyBenchContractSpec pins
    * the format). `queries` carries each query's MIN across ALL timed
    * samples (including contamination-handling extras); `spread` carries
    * max/min across the query's fastest `spreadWindow` samples — the
    * drift-legibility column from the r9 review: two same-evening HEAD
    * runs differed 336 vs 405 s from uniform host drift, and without a
    * per-query spread a wall-time delta can't be classified as regression
    * vs noise from one artifact. spread ≈ 1 ⇒ the min is a stable
    * steady-state number; spread ≫ 1 ⇒ the query is in `contaminated`:
    * even its extra samples straddled a host/JIT storm and its min is the
    * honest floor (single-sample queries report 1.0 by construction).
    * `resampled`/`contaminated` make the r12 failure mode legible: a
    * nonzero n_contaminated says the artifact's totals include storm
    * floors, not engine regressions.
    */
  def resultJson(run: Run, sfDir: String,
      stageWall: Map[String, Double] = Map.empty): String = {
    val qs = run.results.map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    // stage_wall: per-query stage-attributed wall of the SAME round that
    // produced the reported min. This folds the drift adjudication into
    // the primary artifact (VERDICT r10 ask #6): wall ≫ stage_wall with
    // spread ≈ 1 reads as host/harness drift hitting every sample; wall ≈
    // stage_wall reads as real plan cost — previously a reader needed
    // bench_stages.json + NOTES side by side to classify a delta.
    val sw = run.results.map { case (k, _) =>
      "\"" + k + "\":" + f3(stageWall.getOrElse(k, 0.0))
    }.mkString("{", ",", "}")
    val spread = run.results.map { case (k, _) =>
      "\"" + k + "\":" + f3(windowSpread(run.sampleRounds.flatMap(_.get(k)), run.spreadWindow))
    }.mkString("{", ",", "}")
    val total = if (run.results.nonEmpty) run.results.map(_._2).sum else 0.0
    s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,""" +
      s""""spread":$spread,"stage_wall":$sw,""" +
      s""""resampled":${names(run.resampled)},"n_resampled":${run.resampled.length},""" +
      s""""contaminated":${names(run.contaminated)},"n_contaminated":${run.contaminated.length},""" +
      s""""resample_failed":${names(run.resampleFailed.keys.toArray.sorted)},""" +
      s""""n_resample_failed":${run.resampleFailed.size},""" +
      s""""failed":${names(run.failed)},"n_failed":${run.failed.length},""" +
      s""""flaky":${names(run.flaky)},"warmup_failed":${names(run.warmupOnly)},"sf":"$sfDir"}"""
  }

  /** Testable core (VerifyBenchContractSpec): untimed warmup at `warmDir`,
    * then `nRounds` interleaved timed rounds at `sfDir`, min per query.
    * `sparse` queries skip the warmup and the middle timed round (their wall
    * is fixed micro-batch machinery, not plan work). */
  /** @param memoBuild queries whose FIRST invocation per (JVM, sfDir) pays
    *   a one-time build (q301/q302's bucketed table write — the ingest
    *   cost a production layout pays once). They get one extra untimed
    *   pass at `sfDir` before the timed rounds, so their reported min and
    *   spread describe the steady-state query, not sample 1's build
    *   (VERDICT r11 ask #4: q301's spread read 3.0 purely from the
    *   memo-priming sample).
    */
  /** @param spreadBound per-query spread above which the initial samples
    *   are treated as storm-contaminated and the query is re-sampled
    *   (round-13 contamination handling); `maxExtraRounds` bounds the
    *   extra interleaved rounds so a genuinely bimodal query terminates
    *   as `contaminated` instead of looping.
    */
  /** @param fakeClockForTest test-only seam (VerifyBenchContractSpec):
    *   maps a sample tag ("name@r0", "name@w", …) to a FAKE duration in
    *   seconds, replacing the wall clock for that sample. The
    *   contamination tests used to encode storm/steady-state shapes as
    *   real `Thread.sleep` ratios, which a loaded CI host could push
    *   across the spread bound and flake the very test that certifies
    *   storm handling (r13 ADVICE) — injected durations pin the logic,
    *   not host timing. Production callers never pass it.
    */
  def sample(spark: SparkSession, ordered: Seq[(String, QueryFn)], sfDir: String,
      warmDir: String, sparse: Set[String], nRounds: Int,
      memoBuild: Set[String] = Set.empty, spreadBound: Double = 1.5,
      maxExtraRounds: Int = 2,
      fakeClockForTest: String => Option[Double] = _ => None): Run = {
    val timedFailed = new java.util.concurrent.ConcurrentHashMap[String, String]()
    val warmupFailed = new java.util.concurrent.ConcurrentHashMap[String, String]()
    def runOnce(name: String, fn: QueryFn, dir: String, tag: String,
        failSink: java.util.concurrent.ConcurrentHashMap[String, String]): Option[Double] = {
      spark.sparkContext.setJobGroup(tag, name, interruptOnCancel = false)
      tagPut(tag)
      val t0 = System.nanoTime()
      // noop sink forces full materialization of every output column
      // (a bare .count() would let Catalyst prune the computed columns
      // away and under-report the real work).
      try {
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        Some(fakeClockForTest(tag).getOrElse((System.nanoTime() - t0) / 1e9))
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED ($tag): ${e.getMessage}")
        failSink.put(name, Option(e.getMessage).getOrElse(e.getClass.getName).take(300))
        None
      }
      finally {
        spark.sparkContext.clearJobGroup()
        // "" = no sample running (CSLM forbids null values)
        tagPut("")
      }
    }

    // Untimed warmup at the smallest SF only: compiles each query's
    // generated code so timed rounds measure data processing, not one-time
    // codegen. The streaming replay gates skip the warmup: their wall is
    // fixed micro-batch/state-store machinery (bench_stages: stage_wall ≪
    // wall), so JIT-cold codegen is noise against it and the warmup pass
    // costs 2-4 s of real machinery per gate.
    ordered.foreach { case (name, fn) =>
      if (!sparse(name)) runOnce(name, fn, warmDir, s"$name@w", warmupFailed)
    }

    // Untimed memo-priming pass at the TIMED dir for one-time-build
    // queries: the sf0.001 warmup above primes their memo for the warm
    // dir only, so without this pass round 0 at sfDir would bill the
    // bucketed-table write to the query and inflate its spread.
    ordered.foreach { case (name, fn) =>
      if (memoBuild(name)) runOnce(name, fn, sfDir, s"$name@m", warmupFailed)
    }

    // Min-of-N timed samples, INTERLEAVED round-robin (JMH-style min):
    // the JVM suffers sporadic time-localized slowdowns (JIT deopt storms,
    // host CPU-steal windows) that can last several seconds — consecutive
    // samples of one query land in the same storm, but samples a full
    // sweep apart don't, so min-per-query across separated rounds measures
    // the steady state a resident cluster session delivers.
    //
    // The streaming-state gates skip the middle round: their wall is
    // dominated by fixed per-micro-batch state-store latency, not by any
    // plan under perf scrutiny — a third sample buys no signal and costs
    // ~25 s, while a single round-0 sample reports JIT-cold numbers.
    val baseRounds = (0 until nRounds).map { r =>
      ordered.flatMap { case (name, fn) =>
        if (r == 1 && sparse(name)) None
        else runOnce(name, fn, sfDir, s"$name@r$r", timedFailed).map(name -> _)
      }.toMap
    }

    // Contamination handling (round 13): a host storm that straddles ALL
    // of a query's initial samples inflates its reported min 2-6× (the r12
    // artifact's q41 read 16.1 s against a 3.4 s steady state). A query
    // whose samples spread wider than `spreadBound` gets up to
    // `maxExtraRounds` extra interleaved samples — time-separated from the
    // storm window — until the fastest-`nRounds` window tightens under the
    // bound. min stays min over ALL samples (extras can only improve it);
    // queries still wide after the budget are reported `contaminated`.
    //
    // `sparse` streaming gates stay ELIGIBLE here, deliberately: the
    // round-1 skip above saves a third sample when conditions are calm
    // (a calm gate's machinery wall is stable, a third sample buys no
    // signal), but a storm-straddled gate with 2 wide samples has no
    // other route back to a trustworthy floor — without an extra sample
    // its inflated spread would sit unflagged in the artifact (only
    // resampled queries can be classified contaminated). The extra
    // gate samples cost seconds each and fire only under storms; the
    // first full r13 run cured every one of its 124 resamples.
    var rounds: IndexedSeq[Map[String, Double]] = baseRounds
    def spreadOf(name: String): Double =
      windowSpread(rounds.flatMap(_.get(name)), nRounds)
    var suspects: Set[String] = ordered.collect {
      case (name, _) if spreadOf(name) > spreadBound => name
    }.toSet
    val everResampled = scala.collection.mutable.TreeSet.empty[String]
    // extra-round failures go to their OWN sink: a query only reaches an
    // extra round with nRounds successful samples behind it, so an error
    // here must not reclassify it flaky / fail the run (r13 ADVICE — a
    // storm could otherwise fail a bench whose pinned rounds all passed)
    val extraFailed = new java.util.concurrent.ConcurrentHashMap[String, String]()
    var extra = 0
    while (suspects.nonEmpty && extra < maxExtraRounds) {
      val r = nRounds + extra
      val m = ordered.flatMap { case (name, fn) =>
        if (!suspects(name)) None
        else {
          everResampled += name
          runOnce(name, fn, sfDir, s"$name@r$r", extraFailed).map(name -> _)
        }
      }.toMap
      rounds = rounds :+ m
      suspects = suspects.filter(n => spreadOf(n) > spreadBound)
      extra += 1
    }

    val sampleRounds = rounds
    val results = ordered.flatMap { case (name, _) =>
      val times = sampleRounds.flatMap(_.get(name))
      if (times.isEmpty) None else Some(name -> times.min)
    }
    val succeeded = results.map(_._1).toSet
    val timedFailedNames = timedFailed.keySet().toArray(Array.empty[String]).sorted
    import scala.jdk.CollectionConverters._
    Run(
      sampleRounds = sampleRounds,
      results = results,
      failed = timedFailedNames.filterNot(succeeded),
      flaky = timedFailedNames.filter(succeeded),
      warmupOnly = warmupFailed.keySet().toArray(Array.empty[String]).sorted
        .filterNot(timedFailed.containsKey(_)),
      timedFailed = timedFailed.asScala.toMap,
      warmupFailed = warmupFailed.asScala.toMap,
      resampled = everResampled.toArray,
      contaminated = everResampled.filter(n => spreadOf(n) > spreadBound).toArray,
      resampleFailed = extraFailed.asScala.toMap,
      spreadWindow = nRounds,
      spreadBound = spreadBound)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.get("graft-bench", cpus)

    // Per-query stage attribution via job groups: every stage is credited
    // to the (query, round) job group that launched it, so each bench run
    // ships a stage-level profile (bench_stages.json) that separates plan
    // cost (stage-sum ≈ wall) from driver/planning overhead or host
    // CPU-steal (stage-sum ≪ wall) without a rerun.
    //
    // Streaming gates need the fallback below: micro-batch jobs run on the
    // stream-execution thread, which REPLACES the job group with the
    // stream's own runId group, so without it every stateful gate's real
    // task time vanished from stage_wall (q111 read 0.49 s against a 3.2 s
    // wall whose steady state is ~2.1 s of genuine stage time — the r11
    // "wall ≫ stage_wall" streaming signature was an attribution artifact,
    // confirmed by StreamProf's all-stage accounting). Bench runs queries
    // strictly sequentially, so a stage whose job group is not a bench tag
    // belongs to whichever query is running when its job starts.
    val stageGroup = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    // group -> [stageWallSec, runMs, cpuMs, gcMs, nStages]
    val prof = new java.util.concurrent.ConcurrentHashMap[String, Array[Double]]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val g0 = Option(j.properties).map(_.getProperty("spark.jobGroup.id")).orNull
        val g =
          if (g0 != null && g0.contains("@")) g0
          else {
            // j.time is stamped at submission, so the floor window is the
            // sample that submitted this job even if the bus delivers late
            val e = tagWindows.floorEntry(j.time)
            if (e == null || e.getValue.isEmpty) null else e.getValue
          }
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

    // GRAFT_BENCH_ONLY: dev-only comma-list filter (scale-sanity runs
    // over the top-N heaviest queries at the 10× fixture — see
    // docs/SCALING.md). The driver never sets it, so the per-round bench
    // always covers the full registry.
    val only: Option[Set[String]] =
      sys.env.get("GRAFT_BENCH_ONLY").map(_.split(",").map(_.trim).toSet)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val sparseSampled = Set("q108_streaming_staleness", "q111_streaming_sessions",
      "q119_streaming_bars", "q120_streaming_dedup", "q121_streaming_metrics",
      "q122_streaming_zero_rates", "q123_streaming_msg_counts",
      "q127_streaming_ann", "q131_streaming_join", "q137_streaming_outer_join",
      "q138_streaming_tws_sessions", "q139_streaming_file_source",
      "q149_streaming_available_now", "q152_streaming_restart",
      "q153_streaming_late_drop", "q154_foreach_batch_sink",
      "q155_streaming_chained_aggs", "q159_stateful_restart",
      "q204_streaming_tagging", "q208_streaming_upsert",
      "q220_streaming_range_join", "q304_streaming_salted_staleness",
      "q311_streaming_erasure", "q314_streaming_erasure_delta")

    val warmDir = {
      val sib = new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.001")
      if (sib.isDirectory) sib.getPath else sfDir
    }
    // GRAFT_BENCH_ROUNDS: dev-only override for the sf10 third-decade runs
    // (docs/SCALING.md): at 100× a timed round is ~an hour of compute, and
    // the question there is asymptotic SHAPE, not steady-state min — one
    // timed round after the untimed warmup answers it at a third the cost.
    // The driver never sets it, so per-round bench numbers stay min-of-3.
    val nRounds = sys.env.get("GRAFT_BENCH_ROUNDS").map { v =>
      val n = v.toInt
      // a zero/negative round count would emit an empty run with total
      // 0.0 and exit 0 — silently clobbering the checked-in artifact
      require(n >= 1, s"GRAFT_BENCH_ROUNDS must be >= 1, got $v")
      n
    }.getOrElse(3)
    val memoBuild = Set("q301_bucketed_fact_join", "q302_bucket_pruning",
      "q307_bloom_file_skip", "q315_bloom_index_append")
    val run = sample(spark, ordered, sfDir, warmDir, sparseSampled, nRounds, memoBuild)

    run.results.foreach { case (name, sec) =>
      val times = run.sampleRounds.flatMap(_.get(name))
      System.err.println(s"[bench-q] $name ${f3(sec)} s (samples ${times.map(f3).mkString("/")})")
    }
    run.failed.foreach(n => System.err.println(s"[bench-q] $n FAILED (no successful sample): ${run.timedFailed(n)}"))
    run.flaky.foreach(n => System.err.println(s"[bench-q] $n FLAKY (failed ≥1 timed round): ${run.timedFailed(n)}"))
    run.warmupOnly.foreach(n => System.err.println(s"[bench-q] $n warmup-only failure: ${run.warmupFailed(n)}"))
    if (run.resampled.nonEmpty)
      System.err.println(s"[bench] resampled (initial spread > ${run.spreadBound}): ${run.resampled.mkString(", ")}")
    if (run.contaminated.nonEmpty)
      System.err.println(s"[bench] contaminated (still > ${run.spreadBound} after extras): ${run.contaminated.mkString(", ")}")
    val failedJson = names(run.failed)
    val total = if (run.results.nonEmpty) run.results.map(_._2).sum else 0.0
    // Per-query stage_wall of the round that produced the reported min —
    // paired so "wall ≫ stage_wall" is readable from bench_out.json alone.
    val stageWallAtMin: Map[String, Double] = run.results.map { case (name, best) =>
      // indices cover contamination-handling extra rounds past nRounds
      val r = run.sampleRounds.indices
        .find(i => run.sampleRounds(i).get(name).contains(best)).getOrElse(0)
      name -> prof.getOrDefault(s"$name@r$r", new Array[Double](5))(0)
    }.toMap
    val json = resultJson(run, sfDir, stageWallAtMin)

    // Persist full artifacts next to the repo (the captured process tail
    // retains only ~2 KB, which truncates a 161-query map): bench_out.json
    // is the complete result line; bench_stages.json attributes every
    // (query, round) to its stage-level profile so a wall-time delta can
    // be classified as plan change vs host noise in one read.
    // A GRAFT_BENCH_ONLY-filtered run writes *_partial artifacts instead:
    // a subset total is shape-identical to a full-run line, and clobbering
    // the checked-in full-registry artifact would read as a huge
    // regression/improvement to any later comparison.
    val suffix = if (only.isDefined) "_partial" else ""
    try {
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"bench_out$suffix.json"), json + "\n")
      val stages = ordered.map { case (name, _) =>
        val rounds = run.sampleRounds.indices.flatMap { r =>
          run.sampleRounds(r).get(name).map { wall =>
            val a = prof.getOrDefault(s"$name@r$r", new Array[Double](5))
            s"""{"wall":${f3(wall)},"stage_wall":${f3(a(0))},""" +
              s""""run_ms":${a(1).toLong},"cpu_ms":${a(2).toLong},"gc_ms":${a(3).toLong},"n_stages":${a(4).toInt}}"""
          }
        }.mkString("[", ",", "]")
        s""""$name":$rounds"""
      }.mkString("{", ",", "}")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"bench_stages$suffix.json"), stages + "\n")
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
    // 161-name full map is ~3.2 KB, which truncated every BENCH_r0*.json
    // to parsed:null — the compact line carries the total, the 20
    // slowest queries, and a pointer to bench_out.json for the rest.
    val top = run.results.sortBy(-_._2).take(20)
      .map { case (k, v) => "\"" + k + "\":" + f3(v) }.mkString("{", ",", "}")
    print(s"\n$json\n")
    print(s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$top,""" +
      s""""queries_truncated":true,"n_queries":${run.results.size},""" +
      s""""failed":$failedJson,"n_failed":${run.failed.length},""" +
      s""""flaky":${names(run.flaky)},"warmup_failed":${names(run.warmupOnly)},""" +
      s""""queries_file":"bench_out.json","sf":"$sfDir"}\n""")
    System.out.flush()
    // Nonzero rc on any timed failure (hard or flaky): breakage must surface
    // in the driver's BENCH artifact, never masquerade as a fast run.
    // Warmup-only failures are reported above but don't fail the run — every
    // timed sample behind the totals is real.
    if (exitCode(run) != 0) sys.exit(exitCode(run))
  }
}
