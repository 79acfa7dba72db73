package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The zone-map manifest must actually SKIP files, and the compaction
  * plan must satisfy the sorted-greedy packing invariants — these are
  * the properties the DuckDB oracle cannot see (it checks only the
  * layout-invariant results).
  */
class ZoneMapSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("zone-map survivors are a strict subset covering the predicate") {
    val dir = graft.Scratch.dirFor("zonemap_spec", sf)
    Tables.lineitem(spark, sf)
      .repartitionByRange(16, col("l_orderkey"))
      .sortWithinPartitions(col("l_orderkey"))
      .write.mode("overwrite").parquet(s"$dir/li")
    val total = spark.read.parquet(s"$dir/li")
      .select(input_file_name()).distinct().count()
    val survivors = QFilters.zoneMapSurvivors(spark, s"$dir/li",
      lo = 1000L, hi = 3000L)
    assert(survivors.nonEmpty)
    assert(survivors.size < total,
      s"zone map must prune (${survivors.size} of $total files)")
    // completeness: the pruned read returns every matching row
    val pruned = spark.read.parquet(survivors: _*)
      .filter(col("l_orderkey").between(1000L, 3000L)).count()
    val full = Tables.lineitem(spark, sf)
      .filter(col("l_orderkey").between(1000L, 3000L)).count()
    assert(pruned == full, s"pruned read lost rows ($pruned vs $full)")
  }

  test("zone-map planning falls back to the full path when no zone matches") {
    val dir = graft.Scratch.dirFor("zonemap_spec", sf)
    val survivors = QFilters.zoneMapSurvivors(spark, s"$dir/li",
      lo = Long.MaxValue - 1, hi = Long.MaxValue)
    assert(survivors == Seq(s"$dir/li"))
    assert(spark.read.parquet(survivors: _*)
      .filter(col("l_orderkey") >= Long.MaxValue - 1).count() == 0L)
  }

  test("compaction bins are contiguous, conserve bytes, and reach target") {
    val plan = SparkEntryBridge.run(spark, sf, "s17_compaction_plan")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(plan.nonEmpty)
    val target = 131072L
    // rebuild the manifest the planner derives, for exact invariants
    val manifest = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag").as("part"),
        col("l_suppkey").as("file_id"))
      .agg((count(lit(1)) * lit(100L)).as("size_bytes"))
      .collect().map(r => (r.getString(0), r.getLong(2)))
    val bytesByPart = manifest.groupBy(_._1).view
      .mapValues(_.map(_._2).sum).toMap
    val maxFile = manifest.map(_._2).max
    plan.groupBy(_._1).foreach { case (part, bins) =>
      val ids = bins.map(_._2).sorted
      assert(ids.head == 0L, "first bin is 0")
      assert(ids.zip(ids.tail).forall { case (a, b) => b == a + 1 },
        "bins are contiguous")
      bins.foreach { case (_, _, nFiles, totalBytes) =>
        assert(nFiles > 0 && totalBytes > 0)
      }
      // conservation: the plan neither drops nor double-counts a file
      assert(bins.map(_._4).sum == bytesByPart(part))
      // start-offset packing bound: every non-final bin spans at least
      // target − maxFileSize bytes (the straddling file's tail belongs
      // to the next bin's start offset)
      bins.sortBy(_._2).map(_._4).dropRight(1).foreach { b =>
        assert(b >= target - maxFile,
          s"non-final bin below packing bound: $b < ${target - maxFile}")
      }
    }
  }
}

/** Test-only shim: run a registered driver query by name. */
private object SparkEntryBridge {
  def run(s: org.apache.spark.sql.SparkSession, d: String, name: String) =
    graft.SparkEntry.queries(name)(s, d)
}
