package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** The k MinHash signature minima of a shingle-hash set in ONE pass over
  * the array — per-document, no shuffle.
  *
  * For each element `sh` (a non-negative 60-bit hash, e.g. from
  * [[ShingleHash60]]) the (h1 + i·h2) mod p family is evaluated for
  * i = 0..k−1 with p = 2³¹−1:
  *
  *   h1 = sh mod p
  *   h2 = ((40503·⌊sh/2³⁰⌋) mod p · 2³⁰ mod p + 40503·(sh mod 2³⁰) + 12345) mod p
  *
  * — bit-identical to the SQL mixing in [[graft.llmdata.Dedup.h2Sql]] (the
  * split multiply keeps every intermediate below 2⁶³), so the DuckDB
  * oracle that mirrors the exploded groupBy-min formulation reproduces
  * these minima exactly. Replaces the explode → 10⁷-row shuffle →
  * ObjectHashAggregate pass of the grouped formulation: each document's
  * signature is computed inside its own row (embarrassingly parallel; the
  * only thing that ever shuffles downstream is the tiny band-key frame).
  *
  * CodegenFallback is deliberate: the per-ROW interpreted dispatch is
  * amortized over the |arr|·k hash evaluations the eval loop performs.
  */
case class MinHashK(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  require(k >= 1 && k <= 512, s"signature size must be in [1, 512], got $k")

  private val P = 2147483647L // 2^31 − 1

  // annotation omitted: AbstractDataType is private[sql]
  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // an empty (non-null) input yields null output — see nullSafeEval
  override def nullable: Boolean = true
  override def prettyName: String = "minhashk"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    // a zero-element set has no minima: return null rather than an
    // all-Long.MaxValue sentinel signature (which would collide in every
    // LSH band). Mirrors the exploded groupBy-min formulation, where an
    // empty set contributes no rows at all. Unreachable via the
    // library's shingle producers (shortest text still emits one
    // shingle) but reachable through the SQL-registered minhashk.
    if (n == 0) return null
    val mins = Array.fill(k)(Long.MaxValue)
    var contributed = 0
    var j = 0
    while (j < n) {
      // null elements are skipped (mirrors the aggregate min, which
      // ignores nulls); the shingle producers emit containsNull=false
      // arrays so this branch never fires on the library's own frames
      if (!arr.isNullAt(j)) {
        contributed += 1
        val sh = arr.getLong(j)
        val h1 = sh % P
        val h2 = ((40503L * (sh / 1073741824L)) % P * 1073741824L % P
          + 40503L * (sh % 1073741824L) + 12345L) % P
        var i = 0
        var h = h1
        while (i < k) {
          if (h < mins(i)) mins(i) = h
          h += h2
          if (h >= P) h -= P // (h1 + i·h2) mod p, incrementally
          i += 1
        }
      }
      j += 1
    }
    // an array of ONLY null elements is the empty set too — without this
    // it would return the all-Long.MaxValue sentinel the n == 0 guard
    // exists to prevent (universal collision in every LSH band)
    if (contributed == 0) return null
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashK =
    copy(child = newChild)
}
