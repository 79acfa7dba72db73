package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** LSH band bucket keys from a MinHash signature array in one pass — the
  * native form of the banding lambda in
  * [[graft.llmdata.Dedup.bandKeys]]: for each band b, the bucket is
  * `md5(concat_ws('_', sort_array(["i:mh[i]" for i in band b])))`,
  * byte-identical to both the composed transform and the DuckDB oracle's
  * `md5(string_agg(... ORDER BY ...))` (BandBucketsSpec pins it). The
  * nested transform/sort_array/concat lambdas ran interpreted per band
  * per row; this builds and sorts the member strings in Java and md5s
  * once per band.
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
  override def prettyName: String = "bandbuckets"

  override protected def nullSafeEval(input: Any): Any =
    BandBuckets.buckets(input.asInstanceOf[ArrayData], rpb, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.BandBuckets.buckets($c, $rpb, $bands)")

  override protected def withNewChildInternal(newChild: Expression): BandBuckets =
    copy(child = newChild)
}

object BandBuckets {

  private val hexDigits = "0123456789abcdef".toCharArray

  // one digest per task thread, reset per band (constructing one per row
  // would allocate in the hot loop)
  private val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  def buckets(mh: ArrayData, rpb: Int, bands: Int): GenericArrayData = {
    val out = new Array[Any](bands)
    val members = new Array[String](rpb)
    val md = digests.get()
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
      md.reset()
      val d = md.digest(sb.toString.getBytes("UTF-8"))
      val hex = new Array[Char](32)
      var x = 0
      while (x < 16) {
        hex(2 * x) = hexDigits((d(x) >> 4) & 0xF)
        hex(2 * x + 1) = hexDigits(d(x) & 0xF)
        x += 1
      }
      out(b) = UTF8String.fromString(new String(hex))
      b += 1
    }
    new GenericArrayData(out)
  }
}
