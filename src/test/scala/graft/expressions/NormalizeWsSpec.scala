package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The native `normws` must be VALUE-IDENTICAL to the composed
  * `trim(regexp_replace(lower(s), '\s+', ' '))` it replaced — that
  * composed form is what every DuckDB oracle mirrors, so any divergence
  * here is a silent correctness break across the whole text surface.
  */
class NormalizeWsSpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(9042L + i)))

  private def composed(c: org.apache.spark.sql.Column) =
    trim(regexp_replace(lower(c), "\\s+", " "))

  private def check(inputs: Seq[String]): Unit = {
    import spark.implicits._
    graft.GraftExtensions.ensure(spark)
    val diff = inputs.toDF("s")
      .select(call_function("normws", col("s")).as("native"),
        composed(col("s")).as("ref"))
      .filter(col("native") =!= col("ref") ||
        col("native").isNull =!= col("ref").isNull)
      .collect()
    assert(diff.isEmpty, s"normws diverges from composed form: ${diff.toSeq}")
  }

  test("adversarial whitespace, case and unicode layouts") {
    check(Seq(
      "", " ", "  ", "\t\n\r\f", "a", " a ", "  A  B  ",
      "MiXeD\tCaSe\nTOKENS", "tab\tand\nnewline\rand\fform",
      "verticaltabs",
      "non breaking space stays",       //   is NOT Java \s
      "unicode İ ß Ł case",   // dotted I, sharp s, L-stroke
      "ideographic　space stays",        // 　 is NOT Java \s
      "ends with ws \t\n", "\r\n starts with ws",
      "many     spaces    collapse"))
  }

  test("random strings over a ws-heavy alphabet match the composed form") {
    val alphabet =
      Gen.oneOf(('a' to 'e') ++ ('A' to 'E') ++
        Seq(' ', '\t', '\n', '\r', '\f', '', ' ', '0', '.', 'ß'))
    val strGen = Gen.chooseNum(0, 60)
      .flatMap(n => Gen.listOfN(n, alphabet).map(_.mkString))
    check(samples(strGen, 300))
  }
}
