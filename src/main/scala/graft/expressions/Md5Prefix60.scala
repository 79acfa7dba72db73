package graft.expressions

import java.security.MessageDigest
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd 60-bit md5 prefix of a string — the hash family
  * backbone of the dedup ladder ([[graft.llmdata.TextOps.hash60]]).
  *
  * Semantics are EXACTLY `conv(substring(md5(s), 1, 15), 16, 10)` (the
  * first 15 hex digits of the md5 as a non-negative long, i.e. the first
  * 60 bits of the digest), which is what the DuckDB oracles compute — but
  * evaluated straight from the digest BYTES. The expression-composed form
  * materializes a 32-char hex string, substrings it, renders a decimal
  * string (`conv`), and parses it back: four transient allocations per
  * call, tens of millions of calls per dedup pass. This is the (b) tier
  * of the custom-operator ladder: a scalar `Expression` with `doGenCode`,
  * registered via [[graft.GraftExtensions]] as SQL function
  * `md5prefix60`, staying inside whole-stage codegen.
  */
case class Md5Prefix60(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  // type annotation omitted: AbstractDataType is private[sql]; the
  // inferred Seq[DataType] conforms to the inherited signature
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "md5prefix60"

  override protected def nullSafeEval(input: Any): Any =
    Md5Prefix60.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Md5Prefix60.hash($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60 =
    copy(child = newChild)
}

object Md5Prefix60 {

  // MessageDigest is not thread-safe and expensive to construct — one per
  // task thread, reset per call
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** first 60 bits of md5(bytes) as a non-negative long: the big-endian
    * first 8 digest bytes shifted right 4 (dropping the 16th hex digit).
    */
  def hash(bytes: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    first60(d)
  }

  /** same hash over a byte RANGE — lets callers ([[TokenGramHash60]])
    * hash substrings without slicing a fresh array per call.
    */
  def hashRange(bytes: Array[Byte], off: Int, len: Int): Long = {
    val md = digests.get()
    md.reset()
    md.update(bytes, off, len)
    first60(md.digest())
  }

  private def first60(d: Array[Byte]): Long = {
    val v64 =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    v64 >>> 4
  }
}
