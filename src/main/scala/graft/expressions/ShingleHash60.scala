package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All character-n-gram shingle hashes of a string in ONE pass — the
  * positional polynomial hash
  *
  *   h(i) = Σ_{k<n} code(i+k) · 293^(n-1-k)   (codepoints; past-end = 0)
  *
  * evaluated per start position 1..max(len−n+1, 1). Exactly reproducible
  * in ANSI SQL as `ascii(substr(t,i+k,1))`-weighted sums (DuckDB's
  * `ascii('')` is 0, matching the past-end-zero padding), so the DuckDB
  * oracles mirror it with plain integer arithmetic. Replaces per-shingle
  * md5 in the dedup ladder: one expression call hashes a whole document
  * (no substring materialization, no digest), which was the dominant cost
  * of the MinHash pass. Max value ≈ maxCodepoint·Σ293^k < 2^53 — exact
  * int64, and small enough for the (h1 + i·h2) mod p mixing downstream.
  *
  * CodegenFallback is deliberate: the per-ROW interpreted dispatch is
  * amortized over the thousands of hashes the eval loop emits.
  */
case class ShingleHash60(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  // n <= 5 is the documented-safe exact-int64 range: the largest hash is
  // maxCodepoint(0x10FFFF) · Σ_{k<n} 293^k, which stays below 2^53 (where
  // the downstream (h1 + i·h2) split-multiply mixing and the DuckDB-oracle
  // integer equivalence are exact) only for n <= 5 — n = 6 on
  // max-codepoint text silently overflows those assumptions.
  require(n >= 1 && n <= 5,
    s"shingle size must be in [1, 5] (exact-int64 bound), got $n")

  // annotation omitted: AbstractDataType is private[sql]
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shinglehash60"

  override protected def nullSafeEval(input: Any): Any = {
    val cps = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val len = cps.length
    val count = math.max(len - (n - 1), 1)
    val out = new Array[Long](count)
    var i = 0
    while (i < count) {
      var h = 0L
      var k = 0
      while (k < n) {
        h = h * 293L + (if (i + k < len) cps(i + k).toLong else 0L)
        k += 1
      }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHash60 =
    copy(child = newChild)
}
