package graft.llmdata

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * normalization, tokenization, quality scoring, language ID and document
  * fingerprinting. All pure Catalyst expressions (codegen-friendly, no
  * UDFs) and engine-portable (md5 + regex + higher-order functions only),
  * so every operator is DuckDB-oracle-checkable.
  */
object TextOps {

  /** lowercase, collapse whitespace runs to single spaces, trim. */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** whitespace tokens of the normalized text. */
  def tokens(text: Column): Column = split(normalized(text), " ")

  /** BPE-ish token count: letter runs, digit runs, or single punctuation. */
  def bpeishCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  /** stable 60-bit non-negative hash of a string (15 hex chars of md5) —
    * identical in DuckDB via CAST('0x' || substr(md5(s),1,15) AS BIGINT).
    * Backed by the native codegen'd [[graft.expressions.Md5Prefix60]]
    * (hex-string-free digest path; requires the `graft.GraftExtensions`
    * session extension, which every library main and spec configures).
    */
  def hash60(s: Column): Column = call_function("md5prefix60", s)

  /** document fingerprint: md5 of the normalized text. */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** per-language stopword hit counts → argmax language with deterministic
    * tie-break (first in list order). An n-gram-free heuristic language ID.
    */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "to", "and", "in", "is", "it"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "nicht", "zu"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une", "est"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es"))

  def stopwordHits(toks: Column, words: Seq[String]): Column = {
    val arr = array(words.map(lit): _*)
    size(filter(toks, t => array_contains(arr, t)))
  }

  def langId(toks: Column): Column = {
    val scores = stopwords.map { case (lang, ws) => lang -> stopwordHits(toks, ws) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = scores.foldRight(lit("und")) { case ((lang, sc), acc) =>
      when(sc === best && best > 0, lang).otherwise(acc)
    }
    // foldRight so the FIRST language in list order wins ties
    pick
  }
}
