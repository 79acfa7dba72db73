package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd text normalization — the first step of EVERY text /
  * dedup query ([[graft.llmdata.TextOps.normalized]]).
  *
  * Semantics are EXACTLY `trim(regexp_replace(lower(s), '\s+', ' '))`
  * (lowercase, collapse whitespace runs to one space, strip ends) — the
  * form the DuckDB oracles mirror — but in one pass over the lowered
  * string instead of a regex-engine scan plus two more string rewrites.
  * Whitespace is Java regex `\s` = `[ \t\n\x0B\f\r]`, matching what
  * `RegExpReplace` matched before; lowercasing delegates to
  * `UTF8String.toLowerCase`, the same call Spark's `Lower` makes, so the
  * swap is value-invisible (NormalizeWsSpec pins equality on adversarial
  * and random inputs). Registered via [[graft.GraftExtensions]] as SQL
  * function `normws`.
  */
case class NormalizeWs(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "normws"

  override protected def nullSafeEval(input: Any): Any =
    NormalizeWs.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.NormalizeWs.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeWs =
    copy(child = newChild)
}

object NormalizeWs {

  // Java regex \s (default, non-UNICODE_CHARACTER_CLASS): the six ASCII
  // whitespace chars
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def normalize(s: UTF8String): UTF8String = {
    // same lowercase as Spark's Lower expression
    val str = s.toLowerCase.toString
    val n = str.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    var pendingSpace = false
    while (i < n) {
      val c = str.charAt(i)
      if (isWs(c)) {
        // collapse the run; emit a single space only between tokens
        if (sb.length > 0) pendingSpace = true
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}
