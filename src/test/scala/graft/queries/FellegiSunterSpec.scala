package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Fellegi–Sunter linkage (j30_er_fs_score) — the planted corruption
  * classes must land where the model says they land:
  *
  *   class 0 (name typo, phone exact)  → match,    correct
  *   class 1 (name exact, phone digit) → possible, correct
  *   class 2 (name+phone+nation dirty) → possible, correct
  *   class 3 (ALIEN name, phone exact) → possible, correct — and only
  *     reachable through the phone block (gram blocking cannot see it)
  *   class 4 (exact copy)              → match,    correct
  *
  * "Correct" everywhere: the true record must WIN the best-match window
  * for every class, or the weights are mis-calibrated.
  */
class FellegiSunterSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("every corruption class resolves to its true record in its decision band") {
    val out = SparkEntry.queries("j30_er_fs_score")(spark, sf)
      .withColumn("cls", (col("d_id") - 100000L) % 5)
    val byCls = out.groupBy(col("cls"))
      .agg(count(lit(1)).as("n"),
        sum(col("is_correct")).as("n_correct"),
        collect_set(col("decision")).as("decisions"))
      .collect()
      .map(r => r.getAs[Long]("cls") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_correct"),
          r.getAs[Seq[String]]("decisions").toSet)))
      .toMap
    assert(byCls.keySet == Set(0L, 1L, 2L, 3L, 4L))
    val expected = Map(0L -> "match", 1L -> "possible", 2L -> "possible",
      3L -> "possible", 4L -> "match")
    expected.foreach { case (cls, dec) =>
      val (n, correct, decisions) = byCls(cls)
      assert(n > 0)
      assert(correct == n, s"class $cls: $correct of $n linked correctly")
      assert(decisions == Set(dec), s"class $cls decided $decisions, want $dec")
    }
  }

  test("alien-name class is invisible to gram blocking alone") {
    import graft.operators.ErBlocking
    val clean = graft.Tables.customer(spark, sf).select(
      col("c_custkey").as("c_id"),
      concat(lit("Corp-"),
        substring(md5(col("c_custkey").cast("string")), 1, 8)).as("ename"))
    val alien = clean.filter(col("c_id") % 5 === 3).select(
      (col("c_id") + 100000L).as("d_id"),
      concat(lit("X"),
        substring(md5((col("c_id") + 999).cast("string")), 1, 8))
        .as("dname"))
    val viaGrams = ErBlocking.candidates(
        ErBlocking.grams(alien, "dname"),
        ErBlocking.grams(clean, "ename"))
      .filter(col("d_id") - 100000L === col("c_id"))
    assert(viaGrams.count() == 0,
      "an alien name gram-blocked to its own true record — fixture broken")
  }
}
