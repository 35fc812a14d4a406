package graft.operators

import graft.SparkSpec

/** Orientation invariance of triangle counting: q158's degree-ordered
  * wedge anchoring (the 100 TB hub-skew bound — oriented out-degree
  * O(√|E|)) must produce exactly the per-node counts of q117's
  * id-ordered orientation on the same min-support co-supply graph.
  * Every triangle is counted once at exactly one anchor under ANY total
  * order on vertices, so the two queries differ only in which vertex
  * anchors — never in the per-node totals, which sum each vertex's
  * triangle memberships regardless of anchor.
  */
class TriangleOrientSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("degree-ordered q158 equals id-ordered q117 per-node counts") {
    val idOrdered = graft.SparkEntry.queries("q117_triangle_count")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val degOrdered = graft.SparkEntry.queries("q158_triangle_degree_ordered")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(degOrdered.nonEmpty, "fixture produced no triangles")
    assert(degOrdered == idOrdered,
      "degree-ordered orientation changed the per-node triangle counts")
  }
}
