package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native expressions must be value-identical to the expression-
  * composed forms they replaced — that equivalence is what keeps the
  * DuckDB oracles (which mirror the composed forms) green.
  */
class ExpressionsSpec extends SparkSpec {

  test("md5prefix60 equals conv(substring(md5(s),1,15),16,10)") {
    import spark.implicits._
    val df = (Seq("", "a", "hello world", "ünïcödé £", "p:3:17") ++
      (0 until 200).map(i => s"s$i")).toDF("s")
    val mismatches = df
      .withColumn("native", call_function("md5prefix60", col("s")))
      .withColumn("composed", conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long"))
      .filter(col("native") =!= col("composed"))
      .count()
    assert(mismatches == 0)
  }

  test("shinglehash60 equals the per-position polynomial over codepoints") {
    import spark.implicits._
    val df = Seq("abcdefg", "abc", "", "aaaaa", "héllo wörld").toDF("t")
    // composed form: positions 1..max(len-4,1), codepoint-weighted sum
    // with past-end = 0 (ascii() of the empty slice via coalesce)
    val rows = df
      .withColumn("native", call_function("shinglehash60", col("t"), lit(5)))
      .collect()
      .map(r => (r.getString(0), r.getSeq[Long](1)))
    def ref(t: String): Seq[Long] = {
      val cps = t.codePoints().toArray
      (0 until math.max(cps.length - 4, 1)).map { i =>
        (0 until 5).foldLeft(0L)((h, k) =>
          h * 293L + (if (i + k < cps.length) cps(i + k).toLong else 0L))
      }
    }
    rows.foreach { case (t, got) => assert(got == ref(t), s"text '$t'") }
    // short text contributes exactly one hash (the whole-text shingle)
    assert(rows.find(_._1 == "abc").get._2.length == 1)
  }

  test("dotl equals the zip_with/aggregate fold on long arrays") {
    import spark.implicits._
    val df = Seq(
      (Seq(1L, -2L, 3L), Seq(4L, 5L, -6L)),
      (Seq(1000000L, -999999L), Seq(1000000L, 1000000L)),
      (Seq.empty[Long], Seq(1L)))
      .toDF("a", "b")
    val mismatches = df
      .withColumn("native", call_function("dotl", col("a"), col("b")))
      .withColumn("composed", expr(
        "aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + coalesce(v, 0L))"))
      .filter(col("native") =!= col("composed"))
      .count()
    assert(mismatches == 0)
    // wrong element type must fail analysis, not read garbage
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      Seq((Seq(1, 2), Seq(3, 4))).toDF("x", "y")
        .select(call_function("dotl", col("x"), col("y"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("type"))
  }

  test("minhashk equals the (h1 + i*h2) mod p expression fold") {
    import spark.implicits._
    val df = Seq(
      Seq(0L, 1L, 293L, (1L << 53) - 1),
      Seq(7370050801L * 96 + 25153757L * 97),
      Seq.range(0L, 500L).map(_ * 104729L))
      .toDF("arr")
    val p = 2147483647L
    def h2(sh: Long): Long =
      ((40503L * (sh / 1073741824L)) % p * 1073741824L % p
        + 40503L * (sh % 1073741824L) + 12345L) % p
    val rows = df
      .withColumn("native", call_function("minhashk", col("arr"), lit(32)))
      .collect()
      .map(r => (r.getSeq[Long](0), r.getSeq[Long](1)))
    rows.foreach { case (arr, got) =>
      val ref = (0 until 32).map(i =>
        arr.map(sh => (sh % p + i.toLong * h2(sh)) % p).min)
      assert(got == ref, s"arr $arr")
    }
    // misuse (non-array input) must fail analysis, not codegen
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      Seq("x").toDF("s")
        .select(call_function("minhashk", col("s"), lit(4))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("type"))
    // the empty SET has no minima: empty arrays AND all-null-element
    // arrays both yield null, never the all-Long.MaxValue sentinel
    // (which would collide in every LSH band). Reachable only through
    // the SQL-registered function, not the library's shingle producers.
    val degenerate = spark.sql(
      """SELECT minhashk(CAST(array() AS ARRAY<BIGINT>), 4) AS e,
                minhashk(array(CAST(NULL AS BIGINT)), 4) AS an,
                minhashk(array(1L, NULL), 4)             AS part""").head
    assert(degenerate.isNullAt(0) && degenerate.isNullAt(1))
    assert(!degenerate.isNullAt(2)) // a non-null element still signs
  }

  test("dotq6 equals the zip_with/aggregate micro-unit fold") {
    import spark.implicits._
    val df = Seq(
      (Array(0.1f, -0.2f, 0.3f), Array(0.5f, 0.25f, -1.0f)),
      (Array(1.0f, 1.0f, 1.0f), Array(0.0f, 0.0f, 0.0f)),
      (Array(0.1234567f, -0.9999999f, 3.14159f), Array(-0.5f, 0.5f, 0.5f)))
      .toDF("a", "b")
    val composed = aggregate(
      zip_with(col("a"), col("b"),
        (x, y) => floor(x.cast("double") * 1e6 + 0.5).cast("long") *
          floor(y.cast("double") * 1e6 + 0.5).cast("long")),
      lit(0L), (acc, v) => acc + v)
    val mismatches = df
      .withColumn("native", call_function("dotq6", col("a"), col("b")))
      .withColumn("composed", composed)
      .filter(col("native") =!= col("composed"))
      .count()
    assert(mismatches == 0)
  }

  test("rhpbands equals the 16x aggregate(zip_with) sign-bit fold") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = (0 until 50)
      .map(_ => Array.fill(64)(rnd.nextFloat() * 2f - 1f))
      .toDF("embedding")
    // the HOF formulation rhpbands replaced (QSimilarity round 2/3)
    val planes: IndexedSeq[Seq[Long]] = (0 until 16).map(j =>
      (0 until 64).map(i =>
        Md5Prefix60.hash(s"p:$j:$i".getBytes("UTF-8")) % 2001 - 1000))
    val bits = (0 until 16).map { j =>
      val dot = aggregate(
        zip_with(col("embedding"), typedLit(planes(j)),
          (x, w) => floor(x.cast("double") * 1e6 + 0.5).cast("long") * w),
        lit(0L), (a, v) => a + v)
      when(dot >= 0, 1L).otherwise(0L)
    }
    val composed = array((0 until 4).map { b =>
      bits(4 * b) + bits(4 * b + 1) * 2 + bits(4 * b + 2) * 4 +
        bits(4 * b + 3) * 8
    }: _*)
    val mismatches = df
      .withColumn("native", call_function("rhpbands", col("embedding")))
      .withColumn("composed", composed)
      .filter(col("native") =!= col("composed"))
      .count()
    assert(mismatches == 0)
  }
}
