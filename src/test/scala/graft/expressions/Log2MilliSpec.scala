package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** `log2milli` is the engine-portable integer log2 the LM-perplexity
  * query sums per document: its value must equal the composed
  * `bin`/shift/integer-divide SQL formulation the DuckDB oracle uses
  * (pinned here via an independent BigInt reimplementation), stay
  * within the piecewise-linear error envelope of true log2, and be
  * monotone — the properties that make per-doc BIGINT likelihood sums
  * exact and cross-engine stable.
  */
class Log2MilliSpec extends SparkSpec {

  /** the oracle-side formulation, verbatim in BigInt arithmetic:
    * 1000*(len(bin(x))-1) + ((x*1024 >> (len(bin(x))-1)) - 1024)*1000 // 1024
    */
  private def sqlFormulation(x: Long): Long = {
    val e = BigInt(x).bitLength - 1 // = length(bin(x)) - 1
    val frac = (BigInt(x) * 1024) >> e
    (1000 * e + (frac - 1024) * 1000 / 1024).toLong
  }

  private val probes: Seq[Long] =
    (1L to 4096L) ++
      Seq(1L << 20, (1L << 20) + 7, 1L << 40, (1L << 40) + 12345,
        (1L << 52) - 1, 1L << 52, Int.MaxValue.toLong, 999999937L) ++
      (0 until 500).map(i => math.abs(new scala.util.Random(42 + i).nextLong() % (1L << 50)) + 1)

  test("matches the DuckDB oracle formulation on the probe set") {
    probes.foreach { x =>
      assert(Log2Milli.milli(x) === sqlFormulation(x), s"x=$x")
    }
  }

  test("exact at powers of two, monotone, within the linear-interp envelope") {
    (0 until 60).foreach { e =>
      assert(Log2Milli.milli(1L << e) === 1000L * e)
    }
    probes.sorted.sliding(2).foreach {
      case Seq(a, b) =>
        assert(Log2Milli.milli(a) <= Log2Milli.milli(b), s"$a vs $b")
      case _ =>
    }
    probes.foreach { x =>
      val err = Log2Milli.milli(x) / 1000.0 - math.log(x.toDouble) / math.log(2)
      // log2 is concave so the chord e + (m-1) sits BELOW it: error in
      // [-(1 - (1+ln ln 2)/ln 2), 0] ~ [-0.0861, 0], minus <=1e-3
      // milli-quantization
      assert(err >= -0.088 && err <= 0.001, s"x=$x err=$err")
    }
  }

  test("registered SQL function evaluates and throws below domain") {
    val s = spark
    import s.implicits._
    val out = Seq(1L, 3L, 1024L, 999999937L).toDF("x")
      .selectExpr("log2milli(x) AS m").as[Long].collect()
    assert(out.toSeq === Seq(1L, 3L, 1024L, 999999937L).map(Log2Milli.milli))
    val ex = intercept[Exception] {
      Seq(0L).toDF("x").selectExpr("log2milli(x)").collect()
    }
    assert(ex.getMessage != null)
  }
}
