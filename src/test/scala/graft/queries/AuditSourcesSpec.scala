package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Round-7 audit/source additions: the expectations suite's verdict
  * logic, ORC predicate pushdown, and the snapshot-diff ledger algebra.
  */
class AuditSourcesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = {
    graft.GraftExtensions.ensure(spark)
    SparkEntry.queries(name)(spark, sf)
  }

  test("expectations suite: exactly the tightened domain constraint fails") {
    val rows = q("audit_expectations").collect()
    assert(rows.length == 8)
    val failed = rows.filter(_.getAs[Int]("passed") == 0)
      .map(_.getAs[String]("check_name")).toSeq
    assert(failed == Seq("domain(o_orderstatus in F,O)"),
      s"only the deliberately-tight domain may fail, got: $failed")
    // every metric is a ratio in [0, 1]
    rows.foreach { r =>
      val m = r.getAs[Double]("metric")
      assert(m >= 0.0 && m <= 1.0, s"${r.getAs[String]("check_name")}: $m")
    }
  }

  test("ORC round trip pushes the re-read filter into the scan") {
    val plan = q("s13_orc_roundtrip").queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("l_returnflag") && plan.contains("l_quantity"),
      s"re-read ORC scan must carry pushed filters:\n$plan")
  }

  test("mix-reweight plan is feasible and maximal") {
    val rows = q("tx_mix_reweight").collect()
    assert(rows.nonEmpty)
    // feasible: no source asked for more tokens than it has
    rows.foreach { r =>
      assert(r.getAs[Long]("planned_tokens") <= r.getAs[Long]("n_tokens"),
        s"${r.getAs[String]("source")} oversubscribed")
      assert(r.getAs[Long]("accept_milli") <= 1000L)
    }
    // maximal: the binding source is (near-)fully used — its acceptance
    // ratio can only fall short of 1000 by integer-division slack
    assert(rows.map(_.getAs[Long]("accept_milli")).max >= 999L,
      "some source must bind the plan")
  }

  test("histogram buckets partition the rows exactly") {
    val rows = q("audit_histogram").collect()
    val total = graft.Tables.orders(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_rows")).sum == total)
    rows.foreach(r => assert(r.getAs[Double]("lo") < r.getAs[Double]("hi")))
  }

  test("point-in-time join matches at most one interval per probe") {
    // result cardinality == probe cardinality proves the SCD2 intervals
    // partition time: no probe is duplicated (overlap) or dropped (gap)
    val n = q("j22_pit_join").count()
    assert(n == graft.Tables.orders(spark, sf).count())
  }

  test("rollup emits exactly the three grouping levels") {
    val rows = q("a16_rollup").collect()
    val byGid = rows.groupBy(_.getAs[Int]("gid")).view.mapValues(_.length)
    assert(byGid.keySet == Set(0, 1, 3), s"levels: ${byGid.toMap}")
    assert(byGid(3) == 1, "one grand-total row")
    val grand = rows.find(_.getAs[Int]("gid") == 3).get.getAs[Long]("n_rows")
    assert(grand == rows.filter(_.getAs[Int]("gid") == 0)
      .map(_.getAs[Long]("n_rows")).sum)
  }

  test("snapshot diff ledger reconciles with the v2 construction") {
    val byStatus = q("s14_snapshot_diff").collect()
      .groupBy(_.getAs[String]("status"))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    val docs = Tables.documents(spark, sf)
    val n = docs.count()
    val removed = docs.filter(pmod(col("doc_id"), lit(7)) === 0).count()
    val added = docs.filter(pmod(col("doc_id"), lit(13)) === 0).count()
    val changed = docs.filter(pmod(col("doc_id"), lit(7)) =!= 0 &&
      pmod(col("doc_id"), lit(11)) === 0 && col("text") =!= upper(col("text")))
      .count()
    assert(byStatus("removed") == removed)
    assert(byStatus("added") == added)
    assert(byStatus("changed") == changed)
    assert(byStatus.values.sum == n + added,
      "ledger must cover v1 ∪ v2 exactly once per id")
  }
}
