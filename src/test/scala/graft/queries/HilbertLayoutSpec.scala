package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** s28's skipping claim, measured: the SAME rows, the SAME
  * ZOrder.bucketed normalization, the SAME 16-file range-sorted write —
  * once ordered by the Morton interleave, once by the Hilbert index —
  * probed with an identical panel of box predicates through the real
  * parquet-footer zone maps. Hilbert's seam-free adjacency must touch
  * no MORE files than Morton in aggregate (Moon et al. 1996), and both
  * layouts must return identical query answers (layout is never a
  * correctness bet).
  */
class HilbertLayoutSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("box panel touches no more files under Hilbert than under Morton") {
    graft.GraftExtensions.ensure(spark)
    val dir = graft.Scratch.dirFor("hilbert_vs_morton", sf)
    val li = Tables.lineitem(spark, sf)
    val b = li.agg(min(col("l_partkey")), max(col("l_partkey")),
      min(col("l_suppkey")), max(col("l_suppkey"))).collect().head
    val (pLo, pHi, sLo, sHi) =
      (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    val dims = Seq(
      graft.operators.ZOrder.bucketed("l_partkey", pLo, pHi),
      graft.operators.ZOrder.bucketed("l_suppkey", sLo, sHi))
    def layOut(key: org.apache.spark.sql.Column, name: String): String = {
      li.withColumn("k", key)
        .repartitionByRange(16, col("k"))
        .sortWithinPartitions(col("k"))
        .drop("k")
        .write.mode("overwrite").parquet(s"$dir/$name")
      s"$dir/$name"
    }
    val mortonPath = layOut(graft.operators.ZOrder.zValue(dims), "morton")
    val hilbertPath = layOut(
      call_function("hilbertindex", dims.head, dims(1), lit(16)), "hilbert")

    // quarter-span boxes tiling offsets across both dims — wide enough
    // to overlap several files, narrow enough that skipping matters
    val pSpan = pHi - pLo
    val sSpan = sHi - sLo
    val boxes = for {
      fx <- Seq(0.0, 0.25, 0.5, 0.75)
      fy <- Seq(0.0, 0.25, 0.5, 0.75)
    } yield Seq(
      ("l_partkey", pLo + (fx * pSpan).toLong,
        pLo + ((fx + 0.25) * pSpan).toLong),
      ("l_suppkey", sLo + (fy * sSpan).toLong,
        sLo + ((fy + 0.25) * sSpan).toLong))

    def touched(path: String): Int = boxes.map { box =>
      QFilters.zoneMapSurvivorsBox(spark, path, box).size
    }.sum

    val mTouched = touched(mortonPath)
    val hTouched = touched(hilbertPath)
    assert(hTouched <= mTouched,
      s"Hilbert touched $hTouched files vs Morton $mTouched on the panel")
    // and both layouts answer identically on a representative box
    def answer(path: String) = spark.read.parquet(path)
      .filter(col("l_partkey").between(pLo, pLo + pSpan / 4) &&
        col("l_suppkey").between(sLo, sLo + sSpan / 4))
      .agg(count(lit(1)), sum(col("l_quantity").cast("decimal(18,2)")))
      .collect().head
    assert(answer(mortonPath) == answer(hilbertPath),
      "layout changed the answer")
  }
}
