package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.GraphOps

/** Round-8 frontier surface: iterative graph primitives beyond PageRank /
  * triangles (label propagation, k-core peeling), KMV/theta-style distinct
  * sketch set operations, and further training-data-pipeline operators.
  * Same contract as every other registry: each Q is one operator family
  * with a full DuckDB oracle.
  */
object FrontierQueries extends Registry {

  /** The symmetrized customer↔supplier trade graph of q116 (distinct
    * (o_custkey, l_suppkey) pairs via the orderkey join; node ids
    * namespaced 2k / 2k+1). Because the two namespaces are disjoint the
    * symmetrization is a plain UNION ALL — no dedup shuffle. Degrees at
    * sf0.01 span 3..538, so both label spread and core peeling
    * discriminate (unlike the support-thresholded co-supply graph, which
    * is a uniform clique below sf0.1).
    */
  private def tradeGraph(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
    val l = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
    val raw = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    raw.unionByName(raw.select(col("dst").as("src"), col("src").as("dst")))
  }

  private val tradeGraphSql: String =
    """eraw AS (
        SELECT DISTINCT o_custkey*2 AS src, l_suppkey*2+1 AS dst
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      e AS (SELECT src, dst FROM eraw UNION ALL SELECT dst, src FROM eraw)"""

  /** Synchronous min-label propagation, 3 rounds
    * ([[GraphOps.labelPropagationMin]]): after round k each node carries
    * the smallest node id within distance ≤ k — the deterministic core of
    * community/component detection (Raghavan et al. 2007's propagation
    * schedule made order-independent by the MIN combiner, the same
    * message+combine superstep as Pregel). Integer MIN has no tie-break
    * or accumulation-order ambiguity, so the iterative-BSP family gets a
    * full hash oracle: the SQL unrolls the identical recurrence. At
    * 100 TB the per-round join runs on edge/label tables bucketed by node
    * id (shuffle-free supersteps); labels are never broadcast or
    * collected.
    */
  private val q165 = Q("q165_label_propagation",
    (s, d) => {
      GraphOps.labelPropagationMin(tradeGraph(s, d), 3)
        .orderBy("node")
    },
    Some {
      val rounds = (1 to 3).map { i =>
        s"""l$i AS (SELECT node, MIN(lbl) AS lbl FROM (
            SELECT e.dst AS node, p.lbl FROM e JOIN l${i - 1} p ON p.node = e.src
            UNION ALL SELECT node, lbl FROM l${i - 1}) GROUP BY node)"""
      }.mkString(",\n      ")
      s"""WITH $tradeGraphSql,
      n AS (SELECT DISTINCT src AS node FROM e),
      l0 AS (SELECT node, node AS lbl FROM n),
      $rounds
      SELECT node, lbl FROM l3 ORDER BY node"""
    })

  /** k-core peeling, k = 30, 3 fixed rounds ([[GraphOps.kCorePeel]]):
    * each round drops nodes of degree < 30 and restricts edges to
    * survivors — the standard dense-subgraph / spam-hub extraction
    * primitive (Seidman 1983; distributed peeling as in Montresor et
    * al.). A fixed round count keeps the result deterministic and the
    * oracle unrollable; production iterates the same dataflow to
    * fixpoint. Output = surviving nodes with their degree in the final
    * restricted edge set. At sf0.01 round 1 drops roughly the lower
    * half of the degree distribution (median 33), so the peel genuinely
    * cascades.
    */
  private val q166 = Q("q166_kcore_peel",
    (s, d) => {
      GraphOps.kCorePeel(tradeGraph(s, d), 30, 3)
        .orderBy("node")
    },
    Some {
      val rounds = (1 to 3).map { i =>
        s"""a$i AS (SELECT src AS v FROM e${i - 1} GROUP BY src HAVING COUNT(*) >= 30),
        e$i AS (SELECT x.src, x.dst FROM e${i - 1} x
          JOIN a$i sa ON x.src = sa.v JOIN a$i ta ON x.dst = ta.v)"""
      }.mkString(",\n      ")
      s"""WITH $tradeGraphSql,
      e0 AS (SELECT src, dst FROM e),
      $rounds
      SELECT src AS node, COUNT(*) AS deg FROM e3 GROUP BY src ORDER BY node"""
    })

  override val all: Seq[Q] = Seq(q165, q166)
}
