package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The s22 compaction EXECUTION must actually leave a compacted layout:
  * exactly one physical file per planned (part, bin) directory — the
  * whole point of the rewrite is that no small files survive it.
  */
class CompactionSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("compaction rewrite leaves exactly one file per planned bin") {
    // run the query (writes the compacted table as a side effect)
    val manifest = graft.SparkEntry.queries("s22_compaction_exec")(spark, sf)
    val plannedBins = manifest.select("part", "bin").distinct().count()
    graft.Caches.clearTransient()

    val root = java.nio.file.Paths.get(
      graft.Scratch.dirFor("s22_compact", sf), "compacted")
    val perDir = scala.collection.mutable.Map.empty[String, Int]
    val stream = java.nio.file.Files.walk(root)
    try stream.iterator().forEachRemaining { p =>
      if (p.toString.endsWith(".parquet") &&
          java.nio.file.Files.isRegularFile(p)) {
        val dir = p.getParent.toString
        perDir(dir) = perDir.getOrElse(dir, 0) + 1
      }
    } finally stream.close()
    assert(perDir.nonEmpty, "no compacted output found")
    assert(perDir.size.toLong == plannedBins,
      s"bin dirs ${perDir.size} != planned bins $plannedBins")
    val multi = perDir.filter(_._2 > 1)
    assert(multi.isEmpty,
      s"small files survived compaction: $multi")
    // and the rewrite preserved the data: row counts reconcile
    val rewritten = spark.read.parquet(root.toString).count()
    val source = graft.Tables.lineitem(spark, sf).count()
    assert(rewritten == source, s"row loss: $rewritten vs $source")
  }
}
