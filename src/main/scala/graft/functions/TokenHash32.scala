package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `array<string>` tokens → `array<long>` 32-bit token hashes in one pass:
  * each value is the first 4 bytes of the token's md5 digest read
  * big-endian as an unsigned 32-bit integer — bit-identical to the
  * declarative `hexHash32(md5(token))` chain (first 8 hex chars decoded
  * by nibble arithmetic), which the oracle mirrors, but without the
  * 32-char hex string, 8 substrings, and 8 conditional chains per token.
  * Feeds [[graft.operators.Dedup.simhash32]]; null tokens map to null
  * (md5(null) semantics).
  */
case class TokenHash32(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = child.nullable

  @transient private lazy val md5 =
    java.security.MessageDigest.getInstance("MD5")

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val out = new Array[Any](toks.numElements())
    var i = 0
    while (i < toks.numElements()) {
      if (!toks.isNullAt(i)) {
        md5.reset()
        val d = md5.digest(toks.getUTF8String(i).getBytes)
        out(i) = java.lang.Long.valueOf(
          ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
            ((d(2) & 0xffL) << 8) | (d(3) & 0xffL))
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "token_hash32"
}
