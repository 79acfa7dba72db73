package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** 2-D Hilbert-curve index of a bucketed point — the clustering key for
  * [[graft.operators.ZOrder]]-style multi-dimensional layout with
  * strictly better locality than the Morton/z curve: consecutive curve
  * positions are always Manhattan-distance-1 neighbours (HilbertSpec
  * pins both the bijection and this adjacency), so a sorted write
  * produces files whose min/max boxes have no z-curve "seam jumps" and
  * box predicates skip at least as well (Moon et al. 1996, "Analysis of
  * the clustering properties of the Hilbert space-filling curve").
  *
  * Inputs are bucketed dims in [0, 2^bits) — the same
  * [[graft.operators.ZOrder.bucketed]] normalization feeds either
  * curve, making the two layouts drop-in alternatives behind one stats
  * pass. Out-of-range input throws (a silently wrapped coordinate would
  * alias distant rows onto one curve position — the same failure zValue
  * refuses). The iterative rotate-and-accumulate transform is a static
  * primitive loop invoked from generated code (same pattern as
  * [[DotLongs]]) — whole-stage codegen keeps the layout pass UDF-free.
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression with ExpectsInputTypes {

  require(bits >= 1 && 2 * bits <= 62,
    s"2 dims x $bits bits must fit a positive long")

  override def inputTypes = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbertindex"

  override protected def nullSafeEval(x: Any, y: Any): Any =
    HilbertIndex.d2(x.asInstanceOf[Long], y.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (x, y) => s"graft.expressions.HilbertIndex.d2($x, $y, $bits)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {

  /** xy → curve position on the 2^bits × 2^bits grid (Hamilton's
    * rotate-fold formulation, the public-domain Wikipedia xy2d loop
    * generalized to long). Total order in [0, 4^bits).
    */
  def d2(x0: Long, y0: Long, bits: Int): Long = {
    val n = 1L << bits
    if (x0 < 0 || x0 >= n || y0 < 0 || y0 >= n)
      throw new IllegalArgumentException(
        s"hilbertindex: point ($x0, $y0) outside [0, $n)^2 for bits=$bits" +
          " — bucket/normalize the dims first")
    var x = x0
    var y = y0
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) != 0) 1L else 0L
      val ry = if ((y & s) != 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      // rotate/reflect the quadrant so the sub-curve enters/exits
      // correctly; n-1-x flips every bit below log2(n) — bits at or
      // above s are already consumed, so the stale flips are harmless
      if (ry == 0L) {
        if (rx == 1L) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Inverse transform (curve position → grid point) — used by
    * HilbertSpec to pin the adjacency property; kept next to d2 so the
    * two cannot drift.
    */
  def xy(d0: Long, bits: Int): (Long, Long) = {
    val n = 1L << bits
    require(d0 >= 0 && d0 < n * n, s"hilbertindex: position $d0 off-curve")
    var rx = 0L; var ry = 0L
    var x = 0L; var y = 0L
    var t = d0
    var s = 1L
    while (s < n) {
      rx = 1L & (t / 2)
      ry = 1L & (t ^ rx)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }
}
