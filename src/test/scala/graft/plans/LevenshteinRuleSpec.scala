package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.catalyst.expressions.Levenshtein
import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
import org.apache.spark.sql.functions._

/** The levenshtein-bound rewrite must (a) actually fire — threshold'd DP
  * plus length guard in the optimized Filter — and (b) change nothing
  * about the answer, nulls and boundary distances included.
  */
class LevenshteinRuleSpec extends SparkSpec {
  import spark.implicits._

  // parquet-backed, NOT a LocalRelation: ConvertToLocalRelation would
  // otherwise evaluate the whole filter at plan time and leave nothing
  // for the rule (or the assertion) to see
  private lazy val fixture = {
    val p = graft.Scratch.dirFor("lev_rule_spec", "x") + "/pairs"
    Seq(
      ("abc", "abd"),               // dist 1: keep
      ("abc", "abc"),               // dist 0: keep
      ("abc", "xyz"),               // dist 3: drop
      ("short", "a-very-long-one"), // length gap: guard drops pre-DP
      ("ab", "abxy"),               // dist 2: keep at k=2
      (null.asInstanceOf[String], "abc"), // null: drop (null predicate)
      ("abc", null.asInstanceOf[String])
    ).toDF("a", "b").write.mode("overwrite").parquet(p)
    spark.read.parquet(p)
  }

  test("rule rewrites the filter to a length guard + threshold'd DP") {
    val df = fixture.filter(levenshtein($"a", $"b") <= 2)
    val conds = df.queryExecution.optimizedPlan.collect {
      case f: LFilter => f.condition
    }
    assert(conds.nonEmpty, "filter disappeared from the optimized plan")
    val levs = conds.flatMap(_.collect { case l: Levenshtein => l })
    assert(levs.nonEmpty && levs.forall(_.threshold.isDefined),
      s"unbounded levenshtein survived: $levs")
    // the rewrite relies on the bounded form's -1-when-over-budget
    // contract — pin it against the engine
    assert(spark.sql("SELECT levenshtein('abc', 'xyz1234', 2)")
      .head.getInt(0) == -1)
  }

  test("rewrite is answer-preserving (A/B against the disabled rule)") {
    def run(): Set[(String, String)] = {
      val r = fixture.filter(levenshtein($"a", $"b") <= 2)
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      val strict = fixture.filter(levenshtein($"a", $"b") < 2)
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(strict.subsetOf(r))
      r
    }
    val withRule = run()
    spark.conf.set("spark.graft.rules.levBound", "false")
    val without = try run()
      finally spark.conf.set("spark.graft.rules.levBound", "true")
    assert(withRule == without, s"rule changed the answer: $withRule vs $without")
    assert(withRule == Set(("abc", "abd"), ("abc", "abc"), ("ab", "abxy")))
  }
}
