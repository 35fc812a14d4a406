package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.plans.RangePredicate

/** User-facing DSL for the bin-rewritten range join (see
  * [[graft.plans.RangeJoinRewrite]]): an inner join on
  * `point ∈ [lo, hi]` expressed as the engine's [[RangePredicate]],
  * which the injected optimizer rule replaces with a
  * hash-partitionable equi-join on `floor(·/width)` bins (and which
  * evaluates as the plain BETWEEN if the rule is absent).
  *
  * `width` is a semantic knob: intervals replicate to ⌈span/width⌉+1
  * bins, points to exactly one — pick it near the typical interval span
  * so replication stays O(1) while bins stay selective (the LSH banding
  * trade, applied to numeric ranges).
  */
object RangeJoin {
  def binned(left: DataFrame, point: Column, right: DataFrame,
      lo: Column, hi: Column, width: Double): DataFrame =
    left.join(right,
      ColumnBridge.column(RangePredicate(
        ColumnBridge.expression(point), ColumnBridge.expression(lo),
        ColumnBridge.expression(hi), width)))
}
