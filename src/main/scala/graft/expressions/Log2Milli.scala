package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Piecewise-linear integer log2 in MILLI-BITS: for x >= 1,
  * `log2milli(x) = 1000*e + ((x*2^10 >> e) - 1024) * 1000 >> 10` where
  * `e = floor(log2(x))` — the exponent plus a linear interpolation of
  * the mantissa between adjacent powers of two.
  *
  * Why not `ln`/`log2` doubles: the LM-perplexity oracle hash-compares
  * per-document log-likelihood SUMS against DuckDB, and floating sums
  * are order-sensitive (and libm `log` is not bit-identical across
  * engines). This formulation is pure int64 arithmetic — exact,
  * portable (`bin`/`>>`/`//` compose the same value in ANSI SQL), and
  * order-independent under `sum`. Max error vs true log2 is
  * `1 - (1+ln(ln 2))/ln 2 ≈ 0.086` bits, monotone non-decreasing, and
  * exact at powers of two — more than enough resolution to rank and
  * bucket documents by bits-per-token (the CCNet head/middle/tail cut).
  *
  * Domain: x >= 1 (callers add-one-smooth counts); x < 1 throws.
  */
case class Log2Milli(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "log2milli"

  override protected def nullSafeEval(input: Any): Any =
    Log2Milli.milli(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Log2Milli.milli($c)")

  override protected def withNewChildInternal(newChild: Expression): Log2Milli =
    copy(child = newChild)
}

object Log2Milli {

  def milli(x: Long): Long = {
    if (x < 1) throw new IllegalArgumentException(
      s"log2milli: input must be >= 1, got $x")
    val e = 63 - java.lang.Long.numberOfLeadingZeros(x)
    // mantissa in [1024, 2047]: floor(x * 2^10 / 2^e) without overflow
    val frac = if (e >= 10) x >> (e - 10) else x << (10 - e)
    1000L * e + ((frac - 1024L) * 1000L >> 10)
  }
}
