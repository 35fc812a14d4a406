package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The whole winnowing fingerprint pass (Schleimer/Wilkerson/Aiken 2003)
  * as ONE imperative scan — the [[MinHashSigs]] device applied to q175's
  * hot path. Semantically identical to the declarative chain
  * `winnowSelect(kgramHashes(text, k), w)` zipped with its hashes
  * (WinnowingSpec asserts the equivalence): hash every character k-gram
  * with the engine-portable md5→32-bit key (`Dedup.hexHash32` — the
  * first four digest bytes as an unsigned int), select the minimum of
  * every w-hash window with ties to the RIGHTMOST position, and emit
  * each selected (1-based position, hash) once, ascending.
  *
  * Why native: the HOF form allocates a slice + reverse array PER WINDOW
  * plus a boxed hash array per document — the r8 bench showed q175
  * carrying 2-4 s of GC per sample from exactly that churn. This pass
  * keeps one primitive long[] of k-gram hashes and a w-sized monotone
  * deque (O(m) total, the production splitter's algorithm), allocating
  * only the selected set (~2/(w+1) density). ASCII documents hash
  * straight from the UTF8 bytes; multi-byte text falls back to
  * per-position substring (correct, slower).
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1 && w >= 1, s"k and w must be positive, got k=$k w=$w")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pos", LongType, nullable = false),
      StructField("hash", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = child.nullable

  // MessageDigest is NOT thread-safe, and one expression instance can be
  // evaluated concurrently (a cached plan shared across simultaneous jobs,
  // or driver-side folding racing task eval) — a shared instance would
  // silently interleave update/digest and corrupt hashes. ThreadLocal
  // keeps the per-row cost at one map lookup while giving each evaluating
  // thread its own digest.
  @transient private lazy val md5Local =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  private def hash32(digest: Array[Byte]): Long =
    ((digest(0) & 0xffL) << 24) | ((digest(1) & 0xffL) << 16) |
      ((digest(2) & 0xffL) << 8) | (digest(3) & 0xffL)

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String]
    val nChars = text.numChars()
    val m = nChars - (k - 1)
    if (m < w) return new GenericArrayData(Array.empty[Any])
    val hs = new Array[Long](m)
    val md5 = md5Local.get()
    val bytes = text.getBytes
    if (bytes.length == nChars) {
      // pure ASCII: k-gram bytes are k consecutive bytes
      var i = 0
      while (i < m) {
        md5.reset()
        md5.update(bytes, i, k)
        hs(i) = hash32(md5.digest())
        i += 1
      }
    } else {
      var i = 0
      while (i < m) {
        md5.reset()
        md5.update(text.substring(i, i + k).getBytes)
        hs(i) = hash32(md5.digest())
        i += 1
      }
    }
    // sliding-window min with rightmost ties: monotone deque of
    // positions; >= pop means a later equal hash replaces an earlier
    // one, so the front is always the rightmost minimum of the window
    val deque = new Array[Int](m)
    var head = 0
    var tail = 0
    val selPos = new scala.collection.mutable.ArrayBuffer[Int]
    var last = -1
    var i = 0
    while (i < m) {
      while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
      deque(tail) = i
      tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) {
        val p = deque(head)
        if (p != last) { selPos += p; last = p }
      }
      i += 1
    }
    val out = new Array[Any](selPos.length)
    var j = 0
    while (j < selPos.length) {
      val p = selPos(j)
      out(j) = new GenericInternalRow(
        Array[Any]((p + 1).toLong, hs(p)): Array[Any])
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "winnow_fingerprints"
}
