package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics on edge-list DataFrames (the same substrate
  * as [[Dedup.duplicateClusters]]' connected components).
  *
  * PageRank here is FIXED-POINT: ranks are BIGINT multiples of 1e-12
  * (SCALE = 10^12), updates use integer division only —
  * `rank ÷ deg` per edge contribution and `(85 · inflow) ÷ 100` for the
  * damping step — so every iteration is bit-exact on any partitioning,
  * any engine (no floating-point accumulation order to reconcile; the
  * DuckDB oracle unrolls the same integer recurrence). Truncation error
  * is bounded by deg·1e-12 per node per iteration — far below any
  * ranking-relevant difference — and is applied identically everywhere.
  */
object GraphOps {

  val Scale: Long = 1000000000000L // 1.0 in fixed point
  val Base: Long = 150000000000L   // 0.15 in fixed point

  /** `iters` rounds of damped PageRank (d = 0.85) over a directed edge
    * list (`src`, `dst` — pre-deduped). Dangling nodes simply emit no
    * contributions (mass leaks, as in the classic simplification).
    *
    * Scale: per iteration one join of edges against ranks on `src` and
    * one partial/final aggregation by `dst`; `localCheckpoint` truncates
    * lineage so the plan stays O(1) per round. The rank/inflow sides are
    * EXPLICITLY broadcast: they are |V|-sized (16 B/row) while the edge
    * side is |E|-sized, and a checkpointed edge table has no stats — left
    * to itself the planner sort-merge-joined it, re-sorting ALL edges
    * every round (r08: 32 s CPU at sf0.1, ~5× the actual rank math).
    * With the broadcast, each round is one edge SCAN + map-side partial
    * aggregation; edges never shuffle after the one-time degree join.
    * At billions of nodes (rank no longer broadcastable) the same loop
    * runs on edge/rank tables bucketed by `src`/`node` at ingest — the
    * join stays shuffle-free per round, which is the property this shape
    * preserves.
    */
  def pageRankFixed(edges: DataFrame, iters: Int): DataFrame = {
    // Checkpoint the caller's edge construction ONCE before fanning out:
    // `deg`, `nodes`, and the degree join each consume the edge relation,
    // and without this the (often expensive — q116 builds it from a
    // join + two distincts) construction re-executes for every consumer.
    val e = edges.localCheckpoint()
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct().localCheckpoint()
    val withDeg = e.join(deg, "src").localCheckpoint()
    var rank = nodes.withColumn("rank", lit(Scale))
    for (_ <- 1 to iters) {
      val inflow = withDeg
        .join(broadcast(rank.withColumnRenamed("node", "rn")), col("src") === col("rn"))
        .select(col("dst").as("node"), expr("rank div deg").as("contrib"))
        .groupBy("node").agg(sum(col("contrib")).as("inflow"))
      rank = nodes
        .join(broadcast(inflow), Seq("node"), "left")
        .select(col("node"),
          (lit(Base) + expr("(85 * coalesce(inflow, 0L)) div 100")).as("rank"))
        .localCheckpoint()
    }
    rank
  }

  /** `iters` synchronous rounds of MIN-label propagation over a
    * SYMMETRIC edge list (`src`, `dst`; caller symmetrizes): every node
    * starts labeled with its own id, and each round takes the minimum
    * over its neighbors' labels and its own. After k rounds a node's
    * label is exactly the smallest node id within graph distance ≤ k —
    * a deterministic, engine-independent value (pure integer MIN, no
    * tie-break ambiguity), which makes the iterative-BSP community
    * primitive hash-gateable: the oracle unrolls the identical
    * recurrence.
    *
    * Scale: each round is one join of edges against the label table on
    * `src` plus one aggregation by `dst` — the canonical BSP superstep
    * (Pregel's message+combine, public model). The |V|-sized label side
    * is EXPLICITLY broadcast for the same reason as q116's rank vector
    * (GraphOps.pageRankFixed): a checkpointed edge table has no stats,
    * so the planner sort-merge-joins and re-SORTS all |E| edges every
    * round; broadcasting makes each round one edge scan + map-side
    * partial MIN. Past broadcast scale (billions of nodes) the same
    * loop runs on edge/label tables bucketed by node id at ingest, so
    * the per-round join is co-partitioned and shuffle-free either way.
    * `localCheckpoint` truncates lineage so the plan stays O(1) per
    * round. Fixed iteration count (vs convergence detection) keeps
    * rounds deterministic and removes the per-round driver round-trip;
    * production runs pick k ≈ graph diameter of interest.
    */
  def labelPropagationMin(edges: DataFrame, iters: Int): DataFrame = {
    val nodes = edges.select(col("src").as("node")).distinct().localCheckpoint()
    val e = edges.localCheckpoint()
    var lbl = nodes.withColumn("lbl", col("node"))
    for (_ <- 1 to iters) {
      // no broadcast hint: the label table is |V|-sized, so the join
      // strategy is AQE's call — broadcast while small, shuffle join
      // (bucketed by node id at ingest → co-partitioned) at scale
      val fromNbrs = e
        .join(lbl.withColumnRenamed("node", "s"), col("src") === col("s"))
        .select(col("dst").as("node"), col("lbl"))
      lbl = fromNbrs.unionByName(lbl)
        .groupBy("node").agg(min(col("lbl")).as("lbl"))
        .localCheckpoint()
    }
    lbl
  }

  /** `rounds` peeling rounds toward the k-core of a SYMMETRIC edge list:
    * each round computes degrees, drops every node with degree < k, and
    * restricts the edge set to surviving endpoints. The true k-core is
    * the fixpoint; a FIXED round count keeps the computation
    * deterministic and lets the oracle unroll the identical peel (each
    * round is plain degree-count + semi-join SQL). Returns the surviving
    * nodes with their degree in the final restricted edge set.
    *
    * Scale: a round is one aggregation by `src` and two semi-joins of
    * the edge list against the (much smaller, shrinking) survivor set.
    * The survivor side is EXPLICITLY broadcast — it is ≤ |V| ids of
    * 8 bytes and shrinks monotonically, while the checkpointed edge
    * side has no stats and would otherwise be re-sorted for a
    * sort-merge semi-join every round (the q116/LP lesson). On graphs
    * whose vertex set outgrows broadcast, the survivor set virtually
    * always fits after round 1 (peeling removes the long degree-1
    * tail); before that the semi-joins run key-partitioned on
    * ingest-bucketed tables. `localCheckpoint` cuts lineage per round.
    * Production k-core iterates to fixpoint with a convergence check on
    * the dropped count; the per-round dataflow is identical.
    */
  def kCorePeel(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    var e = edges.localCheckpoint()
    for (_ <- 1 to rounds) {
      val alive = e.groupBy("src").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select(col("src").as("v"))
      e = e
        .join(broadcast(alive.withColumnRenamed("v", "sv")),
          col("src") === col("sv"), "left_semi")
        .join(broadcast(alive.withColumnRenamed("v", "dv")),
          col("dst") === col("dv"), "left_semi")
        .localCheckpoint()
    }
    e.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
  }
}
