package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Random-hyperplane LSH band keys for a float-array embedding, in ONE
  * codegen'd pass: 16 deterministic integer hyperplanes (weights
  * md5-derived, so the DuckDB oracle reproduces them exactly — see
  * `QSimilarity.sim_rhp_neardup`), sign bits packed 4-per-band into an
  * array of 4 int64 keys.
  *
  * The previous formulation — 16 × `aggregate(zip_with(...))` higher-order
  * functions — ran INTERPRETED with a boxed lambda per element: ~1024
  * allocating ops per row, which made the signature projection the single
  * slowest stage of the dedup/similarity bench. This is one primitive
  * loop: quantize the 64 components once, then 16 int64 dot products
  * against a static weight table, inside whole-stage codegen.
  */
case class RhpBandKeys(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  // analysis-time contract: anything but array<float> (e.g. array<double>,
  // or a scalar) is an AnalysisException, not a runtime ClassCastException
  // or silently-garbage ArrayData.getFloat reads
  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "rhpbands"

  override protected def nullSafeEval(a: Any): Any =
    RhpBandKeys.keys(a.asInstanceOf[ArrayData])

  // keys() null-propagates on a null ELEMENT (matching the zip_with form it
  // replaced), so the generated code must re-check the result for null
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.RhpBandKeys.keys($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): RhpBandKeys =
    copy(child = newChild)
}

object RhpBandKeys {

  val Planes = 16
  val Dims = 64
  val BandSize = 4
  val Bands: Int = Planes / BandSize

  /** Flattened 16×64 weight table, w(j*64+i) = md5prefix60("p:j:i") % 2001
    * − 1000 — identical to the oracle's `planes` CTE.
    */
  private val w: Array[Long] = {
    val arr = new Array[Long](Planes * Dims)
    var j = 0
    while (j < Planes) {
      var i = 0
      while (i < Dims) {
        arr(j * Dims + i) =
          Md5Prefix60.hash(s"p:$j:$i".getBytes("UTF-8")) % 2001 - 1000
        i += 1
      }
      j += 1
    }
    arr
  }

  /** Null on a null element (the zip_with form this replaced propagated
    * element nulls to a null signature; reading a null slot via getFloat
    * would be undefined).
    */
  def keys(a: ArrayData): ArrayData = {
    val n = math.min(a.numElements(), Dims)
    val q = new Array[Long](Dims)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      q(i) = DotQuant6.quant6(a.getFloat(i))
      i += 1
    }
    val out = new Array[Long](Bands)
    var j = 0
    while (j < Planes) {
      val base = j * Dims
      var dot = 0L
      i = 0
      while (i < n) {
        dot += q(i) * w(base + i)
        i += 1
      }
      if (dot >= 0L) out(j / BandSize) |= 1L << (j % BandSize)
      j += 1
    }
    new GenericArrayData(out)
  }
}
