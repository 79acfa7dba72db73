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

  test("quantile-sketch buckets merge by addition across any split") {
    graft.GraftExtensions.ensure(spark)
    val cents = Tables.orders(spark, sf).select(
      (col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint").as("c"),
      col("o_orderkey"))
    def sketch(df: org.apache.spark.sql.DataFrame) = df
      .select(expr("log2milli(c) div 125").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
    val whole = sketch(cents)
    val merged = sketch(cents.filter(col("o_orderkey") % 2 === 0))
      .unionByName(sketch(cents.filter(col("o_orderkey") % 2 === 1)))
      .groupBy(col("bucket")).agg(sum(col("cnt")).as("cnt"))
    assert(whole.exceptAll(merged).isEmpty && merged.exceptAll(whole).isEmpty)
  }

  test("quantile-sketch error is within one bucket band in milli-bits") {
    val rows = SparkEntry.queries("sk_qsketch_quantiles")(spark, sf).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val err = r.getAs[Long]("err_mb")
      assert(err >= 0 && err < 125,
        s"${r.getAs[String]("q_label")}: err_mb $err outside [0,125)")
    }
  }

  test("interval grid join emits each overlapping pair exactly once") {
    // the grid+first-cell construction must equal the plain theta join
    // pairwise — not just after aggregation (the oracle's view)
    val grid = SparkEntry.queries("j23_interval_grid_join")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val cents = Tables.lineitem(spark, sf).select(
        col("l_quantity"), to_date(col("l_shipdate")).as("ship_d"))
      .withColumn("sd", datediff(col("ship_d"), lit("1995-01-01")))
      .withColumn("ed", col("sd") + col("l_quantity").cast("int"))
    val win = spark.range(0, 28).select(
        col("id").as("win_id"), (col("id") * 90 + 9).cast("int").as("wsd"))
      .withColumn("wed", col("wsd") + 20)
    val theta = cents.crossJoin(win)
      .filter(col("sd") <= col("wed") && col("ed") >= col("wsd"))
      .groupBy(col("win_id")).count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(grid == theta, "grid pair counts diverge from the theta join")
  }
}
