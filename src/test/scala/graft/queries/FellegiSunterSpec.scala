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

  test("EM-learned weights classify pairs at least as well as hand-set") {
    // truth per candidate pair: is it the record's true match?
    val clean = QJoins.fsClean(spark, sf)
    val dirty = QJoins.fsDirty(clean)
    val gam = QJoins.fsGammas(QJoins.fsCand(dirty, clean), dirty, clean)
      .withColumn("is_true",
        (col("c_id") === col("true_id")).cast("int"))
      .persist()
    // learned: j32's per-cell ratio decision joined back onto pairs
    val cells = SparkEntry.queries("j32_er_fs_em")(spark, sf)
      .select(col("gn"), col("gp"), col("gt"),
        (col("cls") === "match").cast("int").as("pred_learned"))
    val learned = gam.join(broadcast(cells), Seq("gn", "gp", "gt"))
    // hand-set: j30's milli-log2 score thresholded at MatchThresh
    import graft.operators.{FellegiSunter => FS}
    val hand = gam.join(dirty, Seq("d_id")).join(clean, Seq("c_id"))
      .withColumn("pred_hand",
        (FS.score(col("dname"), col("ename"), col("dphone"),
          col("ephone"), col("dnation"), col("enation"))
          >= FS.MatchThresh).cast("int"))
    def accuracy(df: org.apache.spark.sql.DataFrame, pred: String): Double =
      df.agg(avg((col(pred) === col("is_true")).cast("double")))
        .head.getDouble(0)
    val accLearned = accuracy(learned, "pred_learned")
    val accHand = accuracy(hand, "pred_hand")
    gam.unpersist()
    assert(accLearned >= accHand,
      s"EM-learned accuracy $accLearned below hand-set $accHand")
    assert(accLearned > 0.9, s"learned classifier too weak: $accLearned")
    // the EM must also have MOVED the params off their priors: the
    // all-agree cell must be (near-)certain match, the all-disagree
    // cell (if present) certain non-match
    val w = SparkEntry.queries("j32_er_fs_em")(spark, sf).collect()
      .map(r => (r.getAs[Int]("gn"), r.getAs[Int]("gp"),
        r.getAs[Int]("gt")) -> r.getAs[Long]("w_milli")).toMap
    assert(w((2, 2, 1)) >= 990, s"exact-agreement cell w=${w((2, 2, 1))}")
    w.get((0, 0, 0)).foreach(v =>
      assert(v <= 10, s"all-disagree cell w=$v"))
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
