package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The properties that make the sketches SKETCHES: HLL registers merge
  * by element-wise max and CMS counters merge by addition over ANY
  * corpus split — the algebra a 1000-executor tree aggregation relies
  * on, checked against the exact constructions the queries ship.
  */
class SketchSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def docs = { graft.GraftExtensions.ensure(spark); Tables.documents(spark, sf) }

  test("HLL registers merge by element-wise max across any split") {
    val whole = QSketch.hllRegisters(docs)
    val a = QSketch.hllRegisters(docs.filter(col("doc_id") % 2 === 0))
    val b = QSketch.hllRegisters(docs.filter(col("doc_id") % 2 === 1))
    val merged = a.unionByName(b)
      .groupBy(col("register")).agg(max(col("max_rho")).as("max_rho"))
    assert(whole.count() > 0)
    assert(whole.exceptAll(merged).count() == 0 &&
      merged.exceptAll(whole).count() == 0,
      "split-merge register table must equal the whole-corpus table")
  }

  test("CMS counters merge by addition across any split") {
    val whole = QSketch.cmsCounters(docs)
    val a = QSketch.cmsCounters(docs.filter(col("doc_id") % 2 === 0))
    val b = QSketch.cmsCounters(docs.filter(col("doc_id") % 2 === 1))
    val merged = a.unionByName(b)
      .groupBy(col("rw"), col("col")).agg(sum(col("counter")).as("counter"))
    assert(whole.count() > 0)
    assert(whole.exceptAll(merged).count() == 0 &&
      merged.exceptAll(whole).count() == 0,
      "split-merge counter table must equal the whole-corpus table")
  }
}
