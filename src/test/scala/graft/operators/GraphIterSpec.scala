package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Unit semantics of the iterative graph primitives behind q165/q166 on
  * hand-built graphs where the answer is checkable by eye.
  */
class GraphIterSpec extends SparkSpec {
  import spark.implicits._

  /** Symmetrize an undirected edge list given as (lo, hi) pairs. */
  private def sym(pairs: (Long, Long)*) = {
    val e = pairs.toDF("src", "dst")
    e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
  }

  test("labelPropagationMin: label = min id within distance <= k") {
    // path 1-2-3-4-5-6 plus isolated-ish pair 10-11
    val edges = sym((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (10L, 11L))
    val got = GraphOps.labelPropagationMin(edges, 2)
      .as[(Long, Long)].collect().toMap
    // after 2 rounds: node v sees min over {u : dist(u,v) <= 2}
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 3L,
      6L -> 4L, 10L -> 10L, 11L -> 10L))
    // one more round closes the path
    val got3 = GraphOps.labelPropagationMin(edges, 5)
      .as[(Long, Long)].collect().toMap
    assert(got3.filterNot(_._1 >= 10L).values.toSet == Set(1L))
  }

  test("kCorePeel: peeling cascades and reports restricted degrees") {
    // triangle 1-2-3 (2-core) with a pendant chain 3-4, 4-5
    val edges = sym((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    // one round of k=2 drops node 5 only (deg 1); node 4 keeps deg 1 vs 3
    val r1 = GraphOps.kCorePeel(edges, 2, 1).as[(Long, Long)].collect().toMap
    assert(r1 == Map(1L -> 2L, 2L -> 2L, 3L -> 3L, 4L -> 1L))
    // two rounds drop node 4 as the peel cascades; triangle survives
    val r2 = GraphOps.kCorePeel(edges, 2, 2).as[(Long, Long)].collect().toMap
    assert(r2 == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // fixpoint reached: a third round changes nothing
    val r3 = GraphOps.kCorePeel(edges, 2, 3).as[(Long, Long)].collect().toMap
    assert(r3 == r2)
    // k above the max degree empties the graph
    assert(GraphOps.kCorePeel(edges, 4, 1).count() == 0L)
  }
}
