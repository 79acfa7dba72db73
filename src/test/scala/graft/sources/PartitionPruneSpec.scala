package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec

/** S11 — the partitioned sink must produce a scan that PRUNES: the
  * month-range predicate resolves against the directory layout, so only
  * the 12 selected partition dirs are read out of the ~80 written. A
  * regression that drops the filter below the scan (e.g. re-deriving the
  * month from the data column) would silently read every partition.
  */
class PartitionPruneSpec extends SparkSpec {

  test("s11 scan reads only the 12 filtered month partitions") {
    val df = graft.SparkEntry.queries("s11_partition_prune")(
      spark, "/root/testdata/sf0.001")
    // collect() executes THIS queryExecution (count() would spawn a
    // separate one whose scan metrics we can't see)
    assert(df.collect().nonEmpty)
    // AQE wraps the plan (AdaptiveSparkPlanExec) and materialized stages
    // (QueryStageExec) hold their subplans as members, not children — a
    // plain collect() sees neither, so descend explicitly
    def findScans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[FileSourceScanExec] = p.collect {
      case s: FileSourceScanExec => Seq(s)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        findScans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        findScans(q.plan)
    }.flatten
    val scans = findScans(df.queryExecution.executedPlan)
    assert(scans.nonEmpty, "expected a FileSourceScanExec")
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty,
      "month predicate must be a PartitionFilter, not a data filter")
    val read = scan.metrics("numPartitions").value
    assert(read == 12, s"expected 12 partitions read, got $read")
    // and the layout on disk really has more than 12 months
    val dir = new java.io.File(
      graft.Scratch.dirFor("s11_part", "/root/testdata/sf0.001"),
      "orders_bymonth")
    val written = dir.listFiles().count(_.getName.startsWith("o_month="))
    assert(written > 12, s"expected >12 written partitions, got $written")
  }

  test("dynamic partition pruning fires when a filtered dim drives the scan") {
    import spark.implicits._
    // the s11 table partitioned by month (written by the test above or
    // any prior run of the query)
    graft.SparkEntry.queries("s11_partition_prune")(
      spark, "/root/testdata/sf0.001").count()
    val dir = new java.io.File(
      graft.Scratch.dirFor("s11_part", "/root/testdata/sf0.001"),
      "orders_bymonth").getAbsolutePath
    val facts = spark.read.parquet(dir)
    // a tiny month dimension filtered at runtime: the fact side's
    // partition filter is not known until the dim is evaluated — exactly
    // the shape DPP exists for (dim filter -> fact partitions skipped).
    // The dim must be a SCANNED source with a real Filter node: an
    // in-memory LocalTableScan constant-folds the predicate away and
    // PartitionPruning never sees a pruning filter to propagate.
    val dimPath = graft.Scratch.dirFor("dpp_dim", "spec") + "/months"
    Seq(("1996-03", "target"), ("1996-04", "target"), ("1997-01", "other"))
      .toDF("m", "tag").write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val joined = facts.join(dim, facts("o_month") === dim("m"))
      .filter($"tag" === "target")
    assert(joined.count() > 0)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamicpruning subquery in the fact scan:\n$plan")
  }
}
