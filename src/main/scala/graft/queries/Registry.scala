package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator demonstration: a Spark query over the harness
  * tables plus (when SQL-expressible) a DuckDB oracle that must produce
  * identical rows at sf0.01.
  */
case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

trait Registry {
  def all: Seq[Q]
}

/** Shared harness for the streaming replay gates (q108, q111, q119-q123,
  * q127, q131, q133).
  */
private[graft] object StreamGate {

  /** Clamp shuffle (= streaming state-store) partitions around a replay
    * gate's stream. Each stateful operator loads and commits one state
    * store instance PER PARTITION PER MICRO-BATCH — a fixed cost that
    * dwarfs the KB of state the replay fixtures actually carry: at the
    * session default of 32 partitions the gates spent ~1-3 s per batch
    * on pure store churn (bench_stages shows stage_wall ≪ wall). The
    * clamp keeps every gated operator distributed — they are partition-
    * invariant by design, and 2 partitions still exercise multi-partition
    * state merge/commit — while cutting the fixed per-batch cost 16x vs
    * the session default (r08 A/B on the six heaviest gates: 8→2
    * partitions cut their wall 25%, while moving checkpoints to tmpfs
    * moved nothing AT 8 PARTITIONS — store instance churn dominated.
    * With the clamp in place the I/O shows again: the r10 A/B measured
    * a further −8% from the tmpfs scratch root, see TempDirs.scratch).
    * Production sizing is the opposite trade: state partitions scale
    * with executor count and amortize over seconds-long batches, which
    * is why this clamps only the gate's stream, not the session.
    * Wrapping `.start()` alone is sufficient AND complete: Structured
    * Streaming clones the session synchronously at query start
    * (StreamExecution.sparkSessionForStream) and every micro-batch
    * plans against the clone, so the immediate restore cannot leak into
    * the stream, and the post-stream batch aggregation over the sink
    * table runs at full session parallelism.
    */
  /** @param noDataBatches keep Spark's watermark-advance (no-data)
    *   micro-batches. The MemoryStream replay gates pass `false`: their
    *   protocols pull every emission through explicit sentinel DATA
    *   rounds (the two-round device), so the engine's extra empty batch
    *   after each watermark advance is pure per-batch fixed cost — with
    *   a watermark, it near-doubles the micro-batch count. File-source
    *   gates keep the default: q159's final windows emit in exactly such
    *   a batch after the sentinel file, and the restart gates should
    *   exercise the engine's stock trigger behavior.
    */
  /** @param keepCodegen opt a gate OUT of the whole-stage-codegen clamp:
    *   gates whose per-batch work is real per-row compute (q204's tagging
    *   expressions, q220's binned range join) lose more to interpreted
    *   eval than they save in per-batch recompiles — measured +0.6 s /
    *   +0.3 s respectively in the r11 A/B, the only two regressions.
    */
  /** @param extraConfs additional confs the stream must start under (e.g.
    *   the RocksDB state-store provider class). Folded into the same
    *   set/restore window as the partition clamp so gate bodies never
    *   touch session confs themselves — this helper is the ONE sanctioned
    *   conf-mutation site in the queries package (ConfHygieneSpec), and
    *   its restore-after-start is safe by the session-clone argument
    *   above.
    */
  def withStatePartitions[A](s: SparkSession, n: Int = 2,
      noDataBatches: Boolean = true, keepCodegen: Boolean = false,
      extraConfs: Seq[(String, String)] = Nil)(body: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val ndKey = "spark.sql.streaming.noDataMicroBatches.enabled"
    val cgKey = "spark.sql.codegen.wholeStage"
    // GRAFT_STATE_PARTITIONS: dev A/B knob for the clamp (the gates are
    // partition-invariant by design, so this can only shift cost, never
    // results — restart gates bake the count into their checkpoint, which
    // stays consistent because the env var is fixed for a process).
    val eff = sys.env.get("GRAFT_STATE_PARTITIONS").map(_.toInt).getOrElse(n)
    // Whole-stage codegen OFF for the gate streams (r11 A/B, StreamProf):
    // a watermarked incremental plan folds the CURRENT WATERMARK VALUE
    // into the generated source as a literal, so every micro-batch's
    // source text is new and janino recompiles the whole pipeline per
    // batch — 0.2-0.8 s of driver time per batch against fixture batches
    // whose interpreted eval costs ~10 ms (q155 steady state 5.4 → 3.8 s,
    // q153 3.2 → 2.4 s; factoryMode=NO_CODEGEN was NET WORSE, so only
    // whole-stage fusion is disabled — per-expression codegen remains).
    // Production sizing is the opposite trade (billion-row batches
    // amortize one compile in ms), which is why this clamps only the
    // gate's cloned session, never the batch session.
    // GRAFT_STREAM_CODEGEN=true restores stock behavior for A/Bs.
    val cg = sys.env.get("GRAFT_STREAM_CODEGEN")
      .getOrElse(if (keepCodegen) "true" else "false")
    val prev = s.conf.get(key)
    val prevNd = s.conf.get(ndKey)
    val prevCg = s.conf.get(cgKey)
    val prevExtra = extraConfs.map { case (k, _) => k -> s.conf.getOption(k) }
    s.conf.set(key, eff.toString)
    s.conf.set(ndKey, noDataBatches.toString)
    s.conf.set(cgKey, cg)
    extraConfs.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      val r = body
      r match {
        case q: org.apache.spark.sql.streaming.StreamingQuery if capturing =>
          capturedQueries += q
        case _ =>
      }
      r
    } finally {
      s.conf.set(key, prev)
      s.conf.set(ndKey, prevNd)
      s.conf.set(cgKey, prevCg)
      prevExtra.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None)    => s.conf.unset(k)
      }
    }
  }

  /** Plan-attestation hook: every StreamingQuery started through
    * [[withStatePartitions]] (all 22 gates funnel their `.start()` here)
    * is recorded while capture is on, so the plan-invariant harness can
    * read each handle's `lastExecution` — the executed micro-batch plan —
    * AFTER the gate returns: the IncrementalExecution object outlives
    * `stop()`. Off by default; production paths retain nothing.
    */
  private val capturedQueries =
    new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.streaming.StreamingQuery]
  @volatile private var capturing = false

  /** Run `body` (typically one registry streaming gate) and return its
    * result plus every StreamingQuery it started. Synchronized: gates run
    * one at a time in the audit paths that use this.
    */
  def captureStreamingQueries[A](body: => A): (A, Seq[org.apache.spark.sql.streaming.StreamingQuery]) =
    synchronized {
      capturing = true
      capturedQueries.clear()
      try { val r = body; (r, capturedQueries.toList) }
      finally { capturing = false; capturedQueries.clear() }
    }
}

/** Conf-scoped batch queries run against a session CLONE, never a
  * set/restore window on the shared session (ADVICE r11 high + VERDICT r11
  * watch item 1). Two failure modes of the window pattern this retires:
  *
  *  - a lazy DataFrame returned from inside the window is re-planned by
  *    `DataFrameWriter` AFTER the `finally` restored the confs, so the
  *    executed plan silently loses the forced shape (q301's zero-exchange
  *    merge join would have benched as a broadcast join);
  *  - a parallel runner planning an unrelated query inside the window
  *    inherits the forced confs.
  *
  * The clone shares the SparkContext and external catalog (bucketed
  * scratch tables stay visible), copies the parent's session state at
  * clone time (confs, temp views, registered functions), and is dropped
  * with the returned DataFrame — whose own `sparkSession` IS the clone, so
  * even a later re-plan of that DataFrame sees the query's confs.
  * ConfHygieneSpec pins the invariant that registry query bodies contain
  * no direct `conf.set` — this helper and StreamGate are the only
  * sanctioned mutation sites.
  */
private[graft] object ConfScope {
  def withConfs[A](s: SparkSession, confs: (String, String)*)(
      body: SparkSession => A): A = {
    val c = org.apache.spark.sql.graftbridge.SessionBridge.cloneSession(s)
    confs.foreach { case (k, v) => c.conf.set(k, v) }
    body(c)
  }
}
