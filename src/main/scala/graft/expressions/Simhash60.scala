package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 60-bit SimHash of a NORMALIZED document in one pass — the
  * shuffle-free formulation of [[graft.llmdata.Dedup.simhash]].
  *
  * Value-identical to the exploded pipeline it replaces (split on ' ',
  * hash each token, per-bit ±1 votes, bit set when the vote sum is ≥ 0
  * — `SimhashExprSpec` pins the equality on random corpora), but the
  * signature is computed inside the document's own row: the token
  * relation never exists, so the per-doc aggregation EXCHANGE disappears
  * and only band keys shuffle — the same scale shape as the MinHash
  * profile pass. Input must already be [[NormalizeWs]]-normalized
  * (single-space token separators); an empty string is one empty token,
  * exactly like `split('', ' ')`.
  *
  * @param useXx hash profile: false = md5-derived
  *              ([[Md5Prefix60]], DuckDB-mirrored), true = XxHash64
  *              (seed 42, Spark's `xxhash64`) masked to 60 bits —
  *              `spark.graft.dedup.hashProfile=xxhash64`, resolved at
  *              plan build like every other profile branch.
  */
case class Simhash60(child: Expression, useXx: Boolean)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override protected def nullSafeEval(input: Any): Any =
    Simhash60.signature(input.asInstanceOf[UTF8String], useXx)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.Simhash60.signature($c, $useXx)")

  override protected def withNewChildInternal(newChild: Expression): Simhash60 =
    copy(child = newChild)
}

object Simhash60 {

  private val Mask60 = (1L << 60) - 1

  private def tokenHash(tok: String, useXx: Boolean): Long =
    if (useXx) {
      val u = UTF8String.fromString(tok)
      XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L) & Mask60
    } else Md5Prefix60.hash(tok.getBytes("UTF-8"))

  def signature(s: UTF8String, useXx: Boolean): Long = {
    val str = s.toString
    val counts = new Array[Int](60)
    var start = 0
    val n = str.length
    // split on ' ' — normalized input has single-space separators, and
    // ""/"" edge cases mirror Spark's split: empty string = one empty token
    var done = false
    while (!done) {
      val sp = str.indexOf(' ', start)
      val end = if (sp < 0) n else sp
      val h = tokenHash(str.substring(start, end), useXx)
      var j = 0
      while (j < 60) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      if (sp < 0) done = true else start = sp + 1
    }
    var sig = 0L
    var j = 0
    while (j < 60) {
      if (counts(j) >= 0) sig |= 1L << j
      j += 1
    }
    sig
  }
}
