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
    * Scale: per iteration one join of edges against ranks on `src`
    * (co-partitioned after the first shuffle) and one partial/final
    * aggregation by `dst`; `localCheckpoint` truncates lineage so the
    * plan stays O(1) per round.
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
        .join(rank.withColumnRenamed("node", "rn"), col("src") === col("rn"))
        .select(col("dst").as("node"), expr("rank div deg").as("contrib"))
        .groupBy("node").agg(sum(col("contrib")).as("inflow"))
      rank = nodes
        .join(inflow, Seq("node"), "left")
        .select(col("node"),
          (lit(Base) + expr("(85 * coalesce(inflow, 0L)) div 100")).as("rank"))
        .localCheckpoint()
    }
    rank
  }
}
