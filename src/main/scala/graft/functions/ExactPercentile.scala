package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Exact nearest-rank (floor-index) percentiles.
  *
  * Semantics match the reference's `_percentiles`
  * (reference/src/metrics/rolling.py:99-111): sort the group's values and
  * take `sorted[int(p * (n-1))]` — i.e. floor of the fractional rank, NO
  * linear interpolation. Spark's built-in `percentile` interpolates, so a
  * native aggregate is required for hash-parity with the reference.
  *
  * Implemented as a Catalyst `TypedImperativeAggregate` (the same mechanism
  * as Spark's own `percentile`): a growable primitive buffer per group with
  * map-side partial aggregation and compact binary shuffle serialization.
  * Cost is O(values-per-group) memory — intended for bounded groups
  * (rolling windows, per-key metric series). For unbounded groups at
  * 100 TB use `approx_percentile` instead; this operator exists for exact
  * reference parity.
  *
  * Returns `array<double>` — one element per requested percentage; null
  * for an empty group.
  */
case class ExactPercentileAgg(
    child: Expression,
    percentages: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Double]] {

  require(percentages.nonEmpty && percentages.forall(p => p >= 0.0 && p <= 1.0),
    "percentages must be within [0, 1]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): ArrayBuffer[Double] =
    new ArrayBuffer[Double]()

  override def update(buf: ArrayBuffer[Double], input: InternalRow): ArrayBuffer[Double] = {
    val v = child.eval(input)
    if (v != null) {
      buf += (v match {
        case d: Double => d
        case f: Float => f.toDouble
        case n: Number => n.doubleValue()
      })
    }
    buf
  }

  override def merge(buf: ArrayBuffer[Double], other: ArrayBuffer[Double]): ArrayBuffer[Double] = {
    buf ++= other
    buf
  }

  override def eval(buf: ArrayBuffer[Double]): Any = {
    if (buf.isEmpty) return null
    val arr = buf.toArray
    java.util.Arrays.sort(arr)
    val n = arr.length
    // floor-index nearest rank: idx = int(p * (n-1)) (rolling.py:107-109)
    val out = percentages.map { p => arr((p * (n - 1)).toInt) }.toArray
    new GenericArrayData(out)
  }

  override def serialize(buf: ArrayBuffer[Double]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(8 * buf.length + 4)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    var i = 0
    while (i < buf.length) { out.writeDouble(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Double] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new ArrayBuffer[Double](n)
    var i = 0
    while (i < n) { buf += in.readDouble(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ExactPercentileAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ExactPercentileAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "exact_percentile"
}

object ExactPercentile {
  /** Column API: `exact_percentiles($"x", Seq(0.5, 0.95, 0.99))`. */
  def apply(c: Column, percentages: Seq[Double]): Column =
    ColumnBridge.column(
      ExactPercentileAgg(ColumnBridge.expression(c), percentages)
        .toAggregateExpression())
}
