package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** LSH band bucket keys from a MinHash signature array in one pass — the
  * native form of the banding lambda in
  * [[graft.llmdata.Dedup.bandKeys]]: for each band b, the bucket is
  * `md5(concat_ws('_', sort_array(["i:mh[i]" for i in band b])))`,
  * byte-identical to both the composed transform and the DuckDB oracle's
  * `md5(string_agg(... ORDER BY ...))` (BandBucketsSpec pins it,
  * including null/short signatures). The nested
  * transform/sort_array/concat lambdas ran interpreted per band per row;
  * this builds and sorts the member strings in Java and md5s once per
  * band.
  *
  * NOT null-propagating, deliberately: in the composed form a NULL
  * signature yields all-NULL members, `concat_ws` skips them and every
  * band gets `md5('')` — the document still lands in (one shared)
  * bucket. A nullSafeEval would instead DROP such documents from the
  * LSH index, silently diverging from the oracle.
  *
  * @param rpb   rows (signature positions) per band, a plan-time literal
  * @param bands band count
  */
case class BandBuckets(child: Expression, rpb: Int, bands: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(rpb >= 1 && bands >= 1,
    s"rowsPerBand and bands must be >= 1, got $rpb / $bands")

  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bandbuckets"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) BandBuckets.nullBuckets(bands)
    else BandBuckets.buckets(v.asInstanceOf[ArrayData], rpb, bands)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val resultType = "org.apache.spark.sql.catalyst.util.GenericArrayData"
    ev.copy(code = code"""
      ${c.code}
      $resultType ${ev.value} = ${c.isNull}
        ? graft.expressions.BandBuckets.nullBuckets($bands)
        : graft.expressions.BandBuckets.buckets(${c.value}, $rpb, $bands);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): BandBuckets =
    copy(child = newChild)
}

object BandBuckets {

  // shared per-thread digest (see Md5Prefix60) — constructing one per row
  // would allocate in the hot loop
  private val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  private val hexDigits = "0123456789abcdef".toCharArray

  private def md5Hex(bytes: Array[Byte]): UTF8String = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    val hex = new Array[Char](32)
    var x = 0
    while (x < 16) {
      hex(2 * x) = hexDigits((d(x) >> 4) & 0xF)
      hex(2 * x + 1) = hexDigits(d(x) & 0xF)
      x += 1
    }
    UTF8String.fromString(new String(hex))
  }

  /** every member NULL → concat_ws('') → md5('') in each band — the
    * composed form's output for a NULL signature
    */
  def nullBuckets(bands: Int): GenericArrayData = {
    val empty = md5Hex(Array.emptyByteArray)
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) { out(b) = empty; b += 1 }
    new GenericArrayData(out)
  }

  def buckets(mh: ArrayData, rpb: Int, bands: Int): GenericArrayData = {
    val out = new Array[Any](bands)
    val members = new Array[String](rpb)
    var b = 0
    while (b < bands) {
      var j = 0
      while (j < rpb) {
        val i = b * rpb + j
        // mh[i] past the end is a null slot in the composed transform's
        // concat -> the whole member string is NULL and concat_ws skips
        // it; mirror by emitting nothing
        members(j) =
          if (i < mh.numElements() && !mh.isNullAt(i))
            i.toString + ":" + mh.getLong(i).toString
          else null
        j += 1
      }
      // null position is immaterial: concat-skip drops them wherever the
      // sort puts them (sort_array is nulls-first; either agrees)
      java.util.Arrays.sort(members,
        java.util.Comparator.nullsLast(
          java.util.Comparator.naturalOrder[String]()))
      val sb = new java.lang.StringBuilder(rpb * 16)
      var first = true
      j = 0
      while (j < rpb) {
        if (members(j) != null) {
          if (!first) sb.append('_')
          sb.append(members(j)); first = false
        }
        j += 1
      }
      out(b) = md5Hex(sb.toString.getBytes("UTF-8"))
      b += 1
    }
    new GenericArrayData(out)
  }
}
