package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe: replicate the synthetic tables K× with OFFSET keys into a
  * scratch dir, then time headline queries against the enlarged data via
  * the normal [[SparkEntry.queries]] path —
  *
  *   tools/run.sh graft.ScaleProbe /root/testdata/sf0.1 5
  *
  * Key offsets (not plain row duplication) keep the workload honest: K×
  * the entity ids / documents, same per-entity density, so the probe
  * measures how the operators scale in the dimension that grows in
  * production. Document texts get a per-copy suffix token — each copy is
  * a DISTINCT near-duplicate of its siblings, which makes the dedup
  * ladder's candidate volume a worst-case-dense stress, not a free pass.
  * Small dimension tables are symlinked unscaled.
  *
  * Emits one JSON line (and SCALE_PROBE.json) with per-query seconds at
  * 1× and K× for the slope.
  */
object ScaleProbe {

  private val Probes = Seq(
    "tp_full_panel", "tp_clean_chain", "a1_daily_panel",
    "dd_exact", "dd_minhash_lsh", "dd_simhash", "dd_decontaminate",
    "tx_corpus_build", "tx_shard_shuffle", "sim_rhp_neardup")

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(5)
    require(copies >= 2, s"need at least 2 copies for a slope, got $copies")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val work = Scratch.dirFor("scaleprobe", s"$src:$copies")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    // key strides are derived from the SOURCE's max id, so copies can
    // never collide at any scale factor (fixed strides would silently
    // overlap once ids outgrow them, shrinking the entity count and
    // corrupting the probe's K-times-entities premise)
    def replicate(name: String, idCols: Seq[String],
        extra: (DataFrame, Int) => DataFrame = (df, _) => df): Unit = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      val strides = idCols.map { c =>
        val row = base.agg(max(col(c).cast("long")).as("mx")).head
        require(!row.isNullAt(0),
          s"$src/$name.parquet is empty or '$c' is all-null — cannot derive a stride")
        c -> (row.getLong(0) + 1L)
      }
      (0 until copies).map { k =>
        extra(strides.foldLeft(base) { case (df, (c, stride)) =>
          df.withColumn(c, col(c) + lit(k.toLong * stride))
        }, k)
      }.reduce(_.unionByName(_))
        .write.mode("overwrite").parquet(s"$work/$name.parquet")
    }
    // events: ts stays a nanos LONG exactly as the source stores it, so
    // graft.Tables' events normalization applies unchanged to the copy
    replicate("events", Seq("user_id", "event_id"))
    replicate("documents", Seq("doc_id"),
      (df, k) => df.withColumn("text",
        concat(col("text"), lit(s" probecopy$k"))))
    replicate("embeddings", Seq("vec_id"))
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem")) {
      val link = java.nio.file.Paths.get(s"$work/$t.parquet")
      if (!java.nio.file.Files.exists(link))
        java.nio.file.Files.createSymbolicLink(link,
          java.nio.file.Paths.get(s"$src/$t.parquet"))
    }

    def timeAll(dir: String): Map[String, Double] = Probes.map { name =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).count()
      Caches.clearTransient()
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap
    // discard a full warm-up pass first: JIT/codegen-cold timings would
    // otherwise inflate x1 and flatter every slope
    timeAll(src); Caches.clearAll()
    val base = timeAll(src); Caches.clearAll()
    val scaled = timeAll(work); Caches.clearAll()

    def f3(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = Probes.map { n =>
      s""""$n":{"x1":${f3(base(n))},"x$copies":${f3(scaled(n))},"slope":${
        f3(scaled(n) / math.max(base(n), 1e-9))}}"""
    }.mkString("{", ",", "}")
    val json =
      s"""{"copies":$copies,"src":"$src","queries":$qs}"""
    println(json)
    try java.nio.file.Files.write(java.nio.file.Paths.get("SCALE_PROBE.json"),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable => System.err.println(s"probe write failed: $e") }
    spark.stop()
  }
}
