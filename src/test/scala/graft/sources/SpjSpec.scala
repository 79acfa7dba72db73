package graft.sources

import graft.SparkSpec
import graft.operators.{SnapshotLog, SnapshotMerge}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Storage-partitioned joins over snapshot tables: two lake tables
  * partitioned on the same column report KeyGroupedPartitioning from
  * their manifests' own labels, every task knows its key, and the join
  * plans with ZERO shuffle exchanges on either side (under
  * `spark.sql.sources.v2.bucketing.enabled`) — the difference between
  * shuffling two 100-TB fact tables and shuffling nothing. Mixed
  * partition-spec eras refuse the grouped report conservatively.
  */
class SpjSpec extends SparkSpec {

  private def fresh(tag: String): String = {
    val base = s"/tmp/graft-test/spj-$tag"
    graft.Scratch.clear(base)
    base
  }

  private def shuffles(df: DataFrame): Int = {
    df.collect()
    def deep(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        deep(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        deep(s.plan)
      case other => other +: other.children.flatMap(deep)
    }
    deep(df.queryExecution.executedPlan)
      .count(_.isInstanceOf[ShuffleExchangeExec])
  }

  private def withSpj[T](f: => T): T = {
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = keys.map { case (k, _) => k -> conf.getOption(k) }
    keys.foreach { case (k, v) => conf.set(k, v) }
    try f finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("same-spec lake tables join with zero shuffles on either side") {
    import spark.implicits._
    val root = fresh("join")
    val dirA = s"$root/a"
    val dirB = s"$root/b"
    val a = (0L until 2400L).map(i => (i, i % 12, i * 2))
      .toDF("ka", "m", "va")
    val b = (0L until 1200L).map(i => (i, i % 12, i * 7))
      .toDF("kb", "m", "vb")
    SnapshotMerge.writeInitial(spark, a, dirA, "m")
    SnapshotMerge.writeInitial(spark, b, dirB, "m")

    withSpj {
      val fa = spark.read.format("graft-snapshot").option("path", dirA)
        .load()
      val fb = spark.read.format("graft-snapshot").option("path", dirB)
        .load()
      // the JOIN plans exchange-free (the one-row global aggregate
      // below would add its own single-partition exchange — that one
      // is the aggregate's, not the join's)
      assert(shuffles(fa.join(fb, "m").select("m", "va", "vb")) == 0,
        "a same-spec lake-to-lake join must plan ZERO shuffle exchanges")
      // oracle: the same join over plain frames
      val want = a.join(b, "m")
        .agg(count(lit(1)), sum(col("va") + col("vb"))).head
      val got = fa.join(fb, "m")
        .agg(count(lit(1)), sum(col("va") + col("vb"))).head
      assert(got == want, s"SPJ changed the answer: $got vs $want")
    }
  }

  test("grouped aggregation on the partition column skips the shuffle") {
    import spark.implicits._
    val root = fresh("agg")
    val dir = s"$root/t"
    val df0 = (0L until 2400L).map(i => (i, i % 12, i * 3))
      .toDF("k", "m", "v")
    SnapshotMerge.writeInitial(spark, df0, dir, "m")
    withSpj {
      val t = spark.read.format("graft-snapshot").option("path", dir)
        .load()
      val agg = t.groupBy("m").agg(sum(col("v")).as("s"),
        count(lit(1)).as("n"))
      assert(shuffles(agg) == 0,
        "group-by on the reported partition key must not shuffle")
      val got = agg.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      val want = df0.groupBy("m").agg(sum(col("v")), count(lit(1)))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
      assert(got.toSeq == want.toSeq)
    }
  }

  test("mixed spec eras and unlabeled tables refuse the grouped report") {
    import spark.implicits._
    val root = fresh("mixed")
    val dir = s"$root/t"
    val df0 = (0L until 240L).map(i => (i, i % 4, i % 3))
      .toDF("k", "m", "g")
    SnapshotMerge.writeInitial(spark, df0, dir, "m")
    // spec evolution: later files labeled by a DIFFERENT column
    SnapshotLog.commitSpecChange(dir, "g")
    val more = (240L until 300L).map(i => (i, i % 4, i % 3))
      .toDF("k", "m", "g")
    graft.operators.SnapshotMerge.appendPartitioned(spark, more, dir, "g")
    val scan = {
      val opts = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of("path", dir))
      new SnapshotScanBuilder(
        SnapshotTables.dataSchema(dir, SnapshotLog.latest(dir)), dir,
        opts).build().asInstanceOf[SnapshotScan]
    }
    assert(scan.outputPartitioning().isInstanceOf[
      org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning],
      "mixed label columns must refuse KeyGroupedPartitioning")
    // and the read stays correct regardless
    val t = spark.read.format("graft-snapshot").option("path", dir).load()
    assert(t.count() == 300L)
  }

  test("TWO-column specs join with zero shuffles on the full key tuple") {
    import spark.implicits._
    val root = fresh("multi")
    val dirA = s"$root/a"
    val dirB = s"$root/b"
    val a = (0L until 2400L).map(i => (i, i % 6, i % 4, i * 2))
      .toDF("ka", "m", "g", "va")
    val b = (0L until 1200L).map(i => (i, i % 6, i % 4, i * 7))
      .toDF("kb", "m", "g", "vb")
    SnapshotMerge.writeInitialMulti(spark, a, dirA, Seq("m", "g"))
    SnapshotMerge.writeInitialMulti(spark, b, dirB, Seq("m", "g"))
    // the manifest carries ordered two-segment labels
    assert(SnapshotLog.entries(dirA, 1).filter(_.kind == "D")
      .forall(e => SnapshotLog.labelColsOf(e.partition) == Seq("m", "g")))

    withSpj {
      val fa = spark.read.format("graft-snapshot").option("path", dirA)
        .load()
      val fb = spark.read.format("graft-snapshot").option("path", dirB)
        .load()
      assert(shuffles(fa.join(fb, Seq("m", "g"))
        .select("m", "g", "va", "vb")) == 0,
        "a same-two-column-spec join must plan ZERO shuffle exchanges")
      val want = a.join(b, Seq("m", "g"))
        .agg(count(lit(1)), sum(col("va") + col("vb"))).head
      val got = fa.join(fb, Seq("m", "g"))
        .agg(count(lit(1)), sum(col("va") + col("vb"))).head
      assert(got == want, s"multi-key SPJ changed the answer: $got")
      // grouped agg on the full tuple rides the same layout
      assert(shuffles(fa.groupBy("m", "g")
        .agg(sum(col("va")).as("s"))) == 0)
    }
  }

  test("a PARTIAL key match refuses the grouped report (join on one " +
      "of two label columns still correct)") {
    import spark.implicits._
    val root = fresh("partial")
    val dirA = s"$root/a"
    val df0 = (0L until 600L).map(i => (i, i % 6, i % 4, i))
      .toDF("k", "m", "g", "v")
    SnapshotMerge.writeInitialMulti(spark, df0, dirA, Seq("m", "g"))
    withSpj {
      val fa = spark.read.format("graft-snapshot").option("path", dirA)
        .load()
      // joining on m ALONE cannot use the (m, g) grouping — Spark
      // must fall back to a planned exchange, and the answer holds
      val dim = (0L until 6L).map(i => (i, i * 100)).toDF("m", "w")
      val j = fa.join(dim, "m").agg(sum(col("v") + col("w")))
      assert(shuffles(j) > 0,
        "a partial-key join must fall back to the ordinary exchange")
      val want = df0.join(dim, "m").agg(sum(col("v") + col("w"))).head
      assert(j.head == want)
      // a key column PRUNED from the output also refuses: project v
      // only, group by nothing the layout serves
      val scanOnlyV = fa.select("v")
      assert(scanOnlyV.count() == 600L)
    }
  }

  test("one side MISSING partition values still joins exchange-free " +
      "(pushPartValues pads the gap)") {
    import spark.implicits._
    val root = fresh("partial-values")
    val dirA = s"$root/a"
    val dirB = s"$root/b"
    val a = (0L until 1200L).map(i => (i, i % 6, i * 2))
      .toDF("ka", "m", "va")
    // B holds only HALF of A's partition values
    val b = (0L until 600L).map(i => (i, i % 3, i * 7))
      .toDF("kb", "m", "vb")
    SnapshotMerge.writeInitial(spark, a, dirA, "m")
    SnapshotMerge.writeInitial(spark, b, dirB, "m")
    withSpj {
      val fa = spark.read.format("graft-snapshot").option("path", dirA)
        .load()
      val fb = spark.read.format("graft-snapshot").option("path", dirB)
        .load()
      assert(shuffles(fa.join(fb, "m").select("m", "va", "vb")) == 0,
        "a partially-clustered same-spec join must stay exchange-free " +
          "under pushPartValues")
      val want = a.join(b, "m")
        .agg(count(lit(1)), sum(col("va") + col("vb"))).head
      val got = fa.join(fb, "m")
        .agg(count(lit(1)), sum(col("va") + col("vb"))).head
      assert(got == want,
        s"partially-clustered SPJ changed the answer: $got vs $want")
    }
  }

  test("SPJ composes with runtime (DPP) pruning: declared partition " +
      "count folds the runtime value set, plan stays valid") {
    import spark.implicits._
    val root = fresh("dpp")
    val dirA = s"$root/a"
    val dirB = s"$root/b"
    val a = (0L until 2400L).map(i => (i, i % 12, i * 2))
      .toDF("ka", "m", "va")
    val b = (0L until 1200L).map(i => (i, i % 12, i * 7))
      .toDF("kb", "m", "vb")
    SnapshotMerge.writeInitial(spark, a, dirA, "m")
    SnapshotMerge.writeInitial(spark, b, dirB, "m")
    // a selective dim: only 2 of the 12 partition values survive
    val dim = Seq((2L, "x"), (5L, "y")).toDF("m", "tag")
    withSpj {
      // DPP needs a broadcastable dim — re-enable broadcasts for the
      // dim leg only (the SPJ legs are pinned merge by the join shape)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
      val fa = spark.read.format("graft-snapshot").option("path", dirA)
        .load()
      val fb = spark.read.format("graft-snapshot").option("path", dirB)
        .load()
      val q = fa.hint("merge").join(fb, "m")
        .join(org.apache.spark.sql.functions.broadcast(dim), "m")
        .groupBy(col("m"))
        .agg(count(lit(1)).as("n"), sum(col("va") + col("vb")).as("s"))
      val want = a.join(b, "m").join(dim, "m").groupBy(col("m"))
        .agg(count(lit(1)).as("n"), sum(col("va") + col("vb")).as("s"))
        .collect().sortBy(_.getLong(0)).toSeq
      val got = q.collect().sortBy(_.getLong(0)).toSeq
      assert(got == want, s"SPJ×DPP changed the answer: $got vs $want")
      // the fact-to-fact leg must not re-shuffle even when runtime
      // filters prune its partitions mid-plan; the grouped aggregate
      // rides the layout too, so the only exchanges allowed are the
      // dim join's broadcast (not a ShuffleExchange)
      assert(shuffles(q) == 0,
        "runtime pruning must not reintroduce exchanges on an SPJ join")
    }
  }
}
