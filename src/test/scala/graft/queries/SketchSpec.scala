package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
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

  test("CMS inner product never underestimates the true join size") {
    // The sk_cms_joinsize estimator's one-sided guarantee: every row's
    // Σ_col cmsA·cmsB ≥ Σ_tok tfA·tfB, because each true (tok, tok)
    // pair contributes its full product to the shared cell and
    // collisions only ADD nonnegative mass.
    val rows = SparkEntry.queries("sk_cms_joinsize")(spark, sf).collect()
    assert(rows.length == 4, "one estimate per CMS row-hash")
    rows.foreach { r =>
      assert(r.getAs[Long]("overcount") >= 0L,
        s"row ${r.getAs[Long]("rw")} underestimated the join size")
    }
  }

  test("incremental micro-batch CMS census equals the whole-corpus table") {
    // the streaming query's exact contract, exercised with a FORCED
    // multi-batch split (one file per trigger over a 3-file copy of the
    // corpus) — the single-file driver path can collapse to one batch,
    // which would make the merge trivially correct
    import org.apache.spark.sql.streaming.Trigger
    val dir = graft.Scratch.dirFor("census_spec", sf)
    graft.Scratch.clear(s"$dir/in"); graft.Scratch.clear(s"$dir/out")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$dir/out"))
    docs.repartition(3).write.mode("overwrite").parquet(s"$dir/in")
    val q = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        QSketch.cmsCounters(batch)
          .write.mode("append").parquet(s"$dir/out")
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val nBatchFiles = spark.read.parquet(s"$dir/out")
      .select(input_file_name()).distinct().count()
    val merged = spark.read.parquet(s"$dir/out")
      .groupBy(col("rw"), col("col")).agg(sum(col("counter")).as("counter"))
    val whole = QSketch.cmsCounters(docs)
    assert(nBatchFiles >= 3, s"expected >=3 micro-batch outputs, got $nBatchFiles")
    assert(whole.exceptAll(merged).count() == 0 &&
      merged.exceptAll(whole).count() == 0,
      "micro-batch-merged census must equal the batch counter table")
  }

  test("grouped HLL estimate is within the m=256 error envelope per source") {
    // 1/sqrt(256) ≈ 6.5% standard error; allow 4 sigma plus the known
    // small-range bias regime (most registers empty at sf0.001 — the
    // raw estimator overshoots low cardinalities, so grade loosely here
    // and exactly via the oracle gate at sf0.01).
    val rows = SparkEntry.queries("sk_hll_grouped")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Double]("est_distinct")
      val truth = r.getAs[Long]("true_distinct").toDouble
      assert(est > 0 && est < truth * 3 + 300,
        s"source ${r.getAs[String]("source")}: est $est vs true $truth")
    }
  }
}
