package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit + invariant tests for the core operator utilities (SURVEY.md §5:
  * as-of picks the latest event ≤ date; dedup keeps exactly one row per
  * key; winsorized values lie within group bounds; sequence matching is
  * 1:1, not m:n).
  */
class OperatorsSpec extends SparkSpec {

  import scala.jdk.CollectionConverters._

  test("AsOfJoin.backward picks the latest event at-or-before, strict picks before") {
    import spark.implicits._
    val left = Seq((1L, 5L, 100L), (1L, 10L, 101L), (2L, 3L, 102L))
      .toDF("id", "t", "row")
    val right = Seq((1L, 5L, "a"), (1L, 8L, "b"), (2L, 9L, "c"))
      .toDF("id", "rt", "payload")
    val inclusive = AsOfJoin.backward(left, right, Seq("id"), "t", "rt",
        Seq("payload"))
      .orderBy("row").select("payload").collect().map(_.getString(0))
    assert(inclusive.toSeq == Seq("a", "b", null))
    val strict = AsOfJoin.backward(left, right, Seq("id"), "t", "rt",
        Seq("payload"), strict = true)
      .orderBy("row").select("payload").collect().map(_.getString(0))
    assert(strict.toSeq == Seq(null, "b", null))
  }

  test("AsOfJoin tie-break: among equal event times the last under rightTieBreak wins") {
    import spark.implicits._
    val left = Seq((1L, 10L)).toDF("id", "t")
    val right = Seq((1L, 10L, 1L, "first"), (1L, 10L, 2L, "second"))
      .toDF("id", "rt", "seq", "payload")
    val out = AsOfJoin.backward(left, right, Seq("id"), "t", "rt",
      Seq("payload"), rightTieBreak = Seq("seq"))
    assert(out.select("payload").head().getString(0) == "second")
  }

  test("Dedup keeps exactly one row per key, honoring the order") {
    import spark.implicits._
    val df = Seq((1L, 3, "c"), (1L, 1, "a"), (1L, 2, "b"), (2L, 9, "z"))
      .toDF("k", "o", "v")
    val first = Dedup.keepFirst(df, Seq("k"), Seq(col("o")))
      .orderBy("k").select("v").collect().map(_.getString(0))
    assert(first.toSeq == Seq("a", "z"))
    val last = Dedup.keepLast(df, Seq("k"), Seq(col("o")))
      .orderBy("k").select("v").collect().map(_.getString(0))
    assert(last.toSeq == Seq("c", "z"))
  }

  test("SeqMatch removes 1:1 by sequence, not m:n") {
    import spark.implicits._
    // three identical trades, ONE reversal → exactly two survive
    val trades = Seq((1L, 1L), (1L, 2L), (1L, 3L)).toDF("k", "o")
    val reversals = Seq((1L, 7L)).toDF("k", "o")
    val out = SeqMatch.antiBySequence(trades, reversals, Seq("k"),
      Seq(col("o").asc), Seq(col("o").asc))
    assert(out.count() == 2)
    // the FIRST trade (seq 1) is the one removed
    assert(out.select("o").collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
  }

  test("Quantiles.winsorize clips into group rank-quantile bounds") {
    import spark.implicits._
    val df = (1 to 100).map(i => ("g", i.toLong, i.toDouble)).toDF("g", "k", "x")
    val out = Quantiles.winsorize(df, Seq("g"), "x", Seq(col("k")),
      qLo = 0.05, qHi = 0.95, outCol = "xw")
    val vals = out.select("xw").collect().map(_.getDouble(0))
    assert(vals.min == 5.0 && vals.max == 95.0) // rank picks: ceil(.05*100)=5
    assert(out.count() == 100)
  }

  test("GapsIslands labels runs of equal values") {
    import spark.implicits._
    val df = Seq((1L, 1L, 10.0), (1L, 2L, 10.0), (1L, 3L, 20.0),
      (1L, 4L, 10.0)).toDF("k", "o", "v")
    val out = GapsIslands.islandId(df, Seq("k"), Seq(col("o")), "v", "isl")
      .orderBy("o").select("isl").collect().map(_.getLong(0))
    assert(out.toSeq == Seq(1L, 1L, 2L, 3L))
  }

  test("AuditedFilter ledger counts reconcile with the filtered frame") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, i % 7)).toDF("k", "m")
    val stages = Seq(
      AuditedFilter.Stage("gt20", col("k") > 20),
      AuditedFilter.Stage("even_mod", col("m") % 2 === 0))
    val ledger = AuditedFilter.ledger(df, stages).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val filtered = AuditedFilter(df, stages).count()
    assert(ledger(0)._2 == 100)
    assert(ledger(0)._3 == 80)
    assert(ledger(1)._2 == 80)
    assert(ledger(1)._3 == filtered)
    assert(ledger.forall { case (_, b, a, r) => b - a == r })
  }

  test("MinHash signature agreement rate approximates Jaccard similarity") {
    import spark.implicits._
    // two docs sharing half their shingles → expected agreement ≈ 1/3
    val sh = (Seq.tabulate(40)(i => (1L, s"sh$i")) ++
      Seq.tabulate(40)(i => (2L, s"sh${i + 20}"))).toDF("id", "shingle")
    val hashed = sh.select(col("id"),
      (graft.llmdata.TextOps.hash60(col("shingle"))
        % graft.llmdata.Dedup.minhashP).as("h1"),
      (graft.llmdata.TextOps.hash60(concat(lit("s:"), col("shingle")))
        % graft.llmdata.Dedup.minhashP).as("h2"))
    val sigs = graft.llmdata.Dedup.minhash(hashed, k = 32)
    val agree = sigs.groupBy("i")
      .agg(countDistinct("mh").as("n"))
      .filter(col("n") === 1).count()
    // true J = 20/60 = 1/3; with 32 hashes expect agreement in [2, 20]
    assert(agree >= 2 && agree <= 20, s"agreement $agree out of plausible band")
  }

  test("AQE's skew-join rewrite fires on a skewed sort-merge join") {
    // SCALING.md's claim "AQE's skew-join splits oversized partitions"
    // as a regression test: a hot key 100× its siblings, broadcast
    // disabled, thresholds lowered so local data sizes qualify — the
    // adaptive plan must mark the join skew=true (partition split).
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> scala.util.Try(conf.get(k)).toOption).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val left = (1 to 120000).map(i =>
          (if (i % 100 == 0) i.toLong % 37 else 7L, i.toLong))
        .toDF("k", "row")
      val right = (0L to 40L).map(i => (i, s"payload_$i")).toDF("k", "p")
      val joined = left.join(right, Seq("k"))
      // execute THIS plan instance (count() would build a separate
      // QueryExecution and leave this one un-finalized)
      assert(joined.collect().length > 0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE skew-join marker in:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("SaltedJoin equals the plain join under heavy key skew") {
    import spark.implicits._
    // 90% of left rows share one hot key
    val left = (1 to 2000).map(i =>
      (if (i % 10 == 0) i.toLong else 7L, i.toLong)).toDF("k", "row")
    val right = (Seq(7L) ++ (10L to 2000L by 100L)).map(i => (i, s"v$i"))
      .toDF("k", "payload")
    val plain = left.join(right, Seq("k"))
      .select("k", "row", "payload").collect()
      .map(_.toSeq.mkString("|")).sorted
    val salted = SaltedJoin.inner(left, right, Seq("k"),
        leftSaltFrom = col("row"), salt = 8)
      .select("k", "row", "payload").collect()
      .map(_.toSeq.mkString("|")).sorted
    assert(salted.toSeq == plain.toSeq)
    assert(plain.nonEmpty)
  }
}
