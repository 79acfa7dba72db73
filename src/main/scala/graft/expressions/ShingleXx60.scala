package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** All character-n-gram XxHash64 shingle hashes of a string in ONE pass
  * — the xxhash64-profile counterpart of [[ShingleHash60]]. Value-equal
  * to `transform(sequence(1, greatest(len-(n-1), 1)), i ->
  * xxhash64(substr(t, i, n)) & (2^60-1))` (ShingleXxSpec pins it), but
  * the substring never exists: character starts are found by one scan
  * over the UTF-8 bytes and each shingle is hashed as a byte RANGE with
  * Spark's own XXH64 (seed 42), so the cluster-scale hash profile gets
  * the same zero-allocation pass the md5-profile polynomial has. Texts
  * shorter than n yield their single whole-string hash, mirroring
  * substr clipping.
  *
  * CodegenFallback as in [[ShingleHash60]]: the interpreted per-ROW
  * dispatch is amortized over the whole document's hashes.
  */
case class ShingleXx60(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shinglexx60"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val bytes = s.getBytes
    val len = bytes.length
    // byte offset of each character start (UTF-8 lead bytes), plus end —
    // a primitive array sized len+1 (chars <= bytes), no boxing
    val charStarts = new Array[Int](len + 1)
    var chars = 0
    var i = 0
    while (i < len) {
      if ((bytes(i) & 0xC0) != 0x80) { charStarts(chars) = i; chars += 1 }
      i += 1
    }
    charStarts(chars) = len
    val count = math.max(chars - (n - 1), 1)
    val out = new Array[Long](count)
    var p = 0
    while (p < count) {
      val from = charStarts(p)
      // substr clips at the end for short texts
      val until = charStarts(math.min(p + n, chars))
      out(p) = XXH64.hashUnsafeBytes(bytes,
        Platform.BYTE_ARRAY_OFFSET + from, until - from, 42L) & ShingleXx60.Mask60
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleXx60 =
    copy(child = newChild)
}

object ShingleXx60 {
  private[expressions] val Mask60 = (1L << 60) - 1
}
