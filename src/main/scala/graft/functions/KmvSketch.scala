package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct sketch: the k smallest DISTINCT
  * 63-bit hashes of a key stream, kept as a sorted array (Bar-Yossef et
  * al. 2002; the θ-sketch of Dasgupta et al. is the same summary with a
  * union rule). The buffer is a bounded, order-insensitive summary —
  * commutative, associative, idempotent merge — so Spark's partial
  * aggregation applies it map-side and ships ≤ k longs per group per
  * partition, never the key stream.
  *
  * What makes KMV the set-operation sketch (vs HLL, q156/q160): the
  * retained hashes are a uniform SAMPLE of the distinct keys, so two
  * sketches support union (k smallest of the merged arrays — exactly the
  * sketch of the union stream) and intersection (matching hashes below
  * the combined threshold estimate Jaccard) — the primitives behind
  * audience-overlap / cross-corpus-contamination estimation at 100 TB,
  * where the exact pairwise distinct-intersection join that q167's
  * oracle runs would be the cost bottleneck.
  *
  * Estimators (θ = kth smallest hash normalized to [0,1)):
  * n̂ = (k−1)/θ when the sketch is full, exact count when |sketch| < k
  * (the sketch then IS the distinct hash set). Relative error is
  * ~1/√(k−2) with Chernoff-style tails, which is what q167's bound
  * columns assert.
  *
  * Insert/merge are O(k) array splices — k is 256; the constant-factor
  * fix at larger k is a heap, not a different dataflow.
  */
class KmvSketchAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], hRaw: Long): Array[Long] = {
    val h = hRaw >>> 1 // 63-bit non-negative hash space
    val pos = java.util.Arrays.binarySearch(buf, h)
    if (pos >= 0) buf // already present
    else {
      val ins = -pos - 1
      if (buf.length < k) {
        val out = new Array[Long](buf.length + 1)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
        out
      } else if (ins < k) {
        // displaces the current maximum
        val out = new Array[Long](k)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, k - ins - 1)
        out
      } else buf
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    // sorted-merge keeping the k smallest distinct values
    val out = new Array[Long](math.min(k, a.length + b.length))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
        else { val x = b(j); j += 1; x }
      if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
