package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All `numHashes` MinHash signature minima in ONE pass over the shingle
  * array. Values are bit-identical to the declarative form
  * ([[graft.operators.Dedup.minhashCols]]):
  * `min over shingles of substring(md5Hex(s"$salt:" + shingle), slice*10, 10)`
  * with salt = i/3, slice = i%3 — three independent 40-bit keys per
  * digest. The declarative path evaluates one transform+md5 chain per
  * signature column (numHashes md5 calls per shingle after projection
  * collapse) and materializes an intermediate array per column; this
  * expression runs ceil(numHashes/3) digests per shingle and keeps only
  * the running minima — no intermediate arrays, ~3x less md5 and far less
  * allocation on the scan-speed hot path of q21/q22/q38.
  *
  * Null/empty semantics mirror `array_min(transform(...))`: null shingle
  * elements are skipped; an empty (or all-null) input yields all-null
  * minima. Hex strings are ASCII so UTF8String binary order == Java
  * String order == the oracle's lexicographic VARCHAR order.
  */
case class MinHashSigs(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = child.nullable

  @transient private lazy val md5 =
    java.security.MessageDigest.getInstance("MD5")
  private val numSalts = (numHashes + 2) / 3
  private val saltPrefixes = (0 until numSalts)
    .map(s => s"$s:".getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray

  private val HEX = "0123456789abcdef".toCharArray

  override def nullSafeEval(input: Any): Any = {
    val shingles = input.asInstanceOf[ArrayData]
    val mins = new Array[String](numHashes)
    var j = 0
    while (j < shingles.numElements()) {
      if (!shingles.isNullAt(j)) {
        val sh = shingles.getUTF8String(j).getBytes
        var salt = 0
        while (salt < numSalts) {
          md5.reset()
          md5.update(saltPrefixes(salt))
          md5.update(sh)
          val digest = md5.digest()
          val hex = new Array[Char](32)
          var b = 0
          while (b < 16) {
            hex(b * 2) = HEX((digest(b) >> 4) & 0xf)
            hex(b * 2 + 1) = HEX(digest(b) & 0xf)
            b += 1
          }
          var slice = 0
          while (slice < 3 && salt * 3 + slice < numHashes) {
            val idx = salt * 3 + slice
            val cand = new String(hex, slice * 10, 10)
            if (mins(idx) == null || cand.compareTo(mins(idx)) < 0) mins(idx) = cand
            slice += 1
          }
          salt += 1
        }
      }
      j += 1
    }
    new GenericArrayData(mins.map(m =>
      if (m == null) null else UTF8String.fromString(m)): Array[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "minhash_sigs"
}
