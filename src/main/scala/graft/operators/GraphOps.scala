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
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val nodes = edges.select(col("src").as("node"))
      .unionByName(edges.select(col("dst").as("node")))
      .distinct().localCheckpoint()
    val withDeg = edges.join(deg, "src").localCheckpoint()
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
}
