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
}
