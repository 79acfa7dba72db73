package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The two properties that make the KMV sketch a SKETCH, plus the
  * measured accuracy the query ships:
  *
  *  1. Exactness below theta — below the side's k-th smallest hash the
  *     sketch IS the universe (no sampling error inside the retained
  *     range), which is exactly why `sk_kmv_overlap`'s union/intersection
  *     counts below theta_min are p-samples and not heuristics.
  *  2. Bottom-k mergeability — bottom-k of unioned partial bottom-k's
  *     equals bottom-k of the whole relation, the algebra that lets the
  *     k-bounded Aggregator partial-aggregate on any executor tree.
  */
class KmvSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def docs = {
    graft.GraftExtensions.ensure(spark)
    Tables.documents(spark, sf)
  }

  test("below theta the sketch is exactly the universe (p-sample claim)") {
    val k = QSketch.KmvK
    val hv = QSketch.kmvHashes(docs).persist()
    val sk = QSketch.kmvSketch(docs, k).persist()
    val thetas = sk.filter(col("rk") === k)
      .select(col("side"), col("h").as("theta"))
    // every (side, h) in the FULL distinct universe with h < theta must
    // appear in the sketch — and the sketch holds nothing above theta
    val missing = hv.join(thetas, Seq("side"))
      .filter(col("h") < col("theta"))
      .join(sk.select(col("side"), col("h")), Seq("side", "h"), "left_anti")
    assert(missing.count() == 0,
      "a universe hash below theta is missing from the sketch")
    val above = sk.join(thetas, Seq("side")).filter(col("h") > col("theta"))
    assert(above.count() == 0, "sketch retained a hash above theta")
    hv.unpersist(); sk.unpersist()
  }

  test("bottom-k merges: bottom-k of partial bottom-k's == bottom-k of whole") {
    val k = 64
    val hv = QSketch.kmvHashes(docs).persist()
    val whole = QSketch.kmvSketchFrom(hv, k)
      .select(col("side"), col("rk"), col("h"))
    // split the universe by hash parity (disjoint), sketch each split,
    // then sketch the UNION OF SKETCHES — the tree-merge a cluster does
    val partials = QSketch.kmvSketchFrom(hv.filter(col("h") % 2 === 0), k)
      .unionByName(QSketch.kmvSketchFrom(hv.filter(col("h") % 2 === 1), k))
      .select(col("side"), col("h"))
    val merged = QSketch.kmvSketchFrom(partials, k)
      .select(col("side"), col("rk"), col("h"))
    assert(whole.exceptAll(merged).count() == 0 &&
      merged.exceptAll(whole).count() == 0,
      "merged partial sketches must equal the whole-relation sketch")
    hv.unpersist()
  }

  test("multi-batch census merge == whole-corpus sketch (partition-col trap)") {
    // the streaming census externalizes one sketch dir per micro-batch
    // (`batch=N`); reading them back APPENDS the inferred partition
    // column, and a distinct over (side, h, batch) would keep a hash
    // surviving in two batches twice — eating rk slots and corrupting
    // theta. Reproduce a 2-batch run where sketches OVERLAP heavily
    // (both batches cover the full corpus per side) and pin the merge
    // against the whole-corpus batch sketch.
    val outDir = graft.Scratch.dirFor("kmv_census_spec", sf) + "/sketches"
    graft.Scratch.clear(outDir)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val k = QSketch.KmvK
    for ((batch, id) <- Seq(docs -> 0, docs.limit(400) -> 1))
      QSketch.kmvSketchFrom(QSketch.kmvHashes(batch), k)
        .select(col("side"), col("h"))
        .write.mode("overwrite").parquet(s"$outDir/batch=$id")
    val merged = QStreaming.kmvCensusMerge(spark, outDir)
      .select(col("side"), col("rk"), col("h"))
    val whole = QSketch.kmvSketch(docs, k)
      .select(col("side"), col("rk"), col("h"))
    assert(merged.exceptAll(whole).count() == 0 &&
      whole.exceptAll(merged).count() == 0,
      "census merge over overlapping batch sketches diverged from the batch face")
  }

  test("sk_kmv_overlap estimates land within the 1/sqrt(k) band and are graded") {
    val row = SparkEntry.queries("sk_kmv_overlap")(spark, sf).collect().head
    val estU = row.getAs[Double]("est_union")
    val trueU = row.getAs[Long]("true_union").toDouble
    val estI = row.getAs[Double]("est_inter")
    val trueI = row.getAs[Long]("true_inter").toDouble
    // deterministic data + deterministic hashes => these are fixed
    // measurements; 0.15 is ~2.4 standard errors at k=256
    assert(math.abs(estU - trueU) / trueU < 0.15,
      s"union estimate off by ${math.abs(estU - trueU) / trueU}")
    assert(math.abs(estI - trueI) / trueI < 0.15,
      s"intersection estimate off by ${math.abs(estI - trueI) / trueI}")
    assert(row.getAs[Long]("n_inter_sample") <=
      row.getAs[Long]("n_union_sample"))
    assert(row.getAs[Long]("theta_a") > 0 && row.getAs[Long]("theta_b") > 0)
  }

  test("sk_kmv_matrix covers all pairs and grades in aggregate") {
    val rows = SparkEntry.queries("sk_kmv_matrix")(spark, sf).collect()
    val nSources = docs.select(col("source")).distinct().count()
    assert(rows.length == nSources * (nSources - 1) / 2,
      "one row per unordered source pair")
    // per-pair samples are small (k=128 over ~1200-gram universes) so
    // individual pairs are noisy BY DESIGN; the matrix's contract is
    // aggregate accuracy — ~8% measured on this corpus, band 3x
    val estSum = rows.map(_.getAs[Double]("est_inter")).sum
    val trueSum = rows.map(_.getAs[Long]("true_inter")).sum.toDouble
    assert(math.abs(estSum - trueSum) / trueSum < 0.25,
      s"aggregate overlap estimate off by ${math.abs(estSum - trueSum) / trueSum}")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_inter_sample") <= r.getAs[Long]("true_inter"),
        "a p-sample can never exceed the exact intersection")
    }
  }
}
