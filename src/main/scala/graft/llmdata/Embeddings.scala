package graft.llmdata

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-space operators: exact-decimal dot products / cosine, brute-
  * force top-k and an IVF-style cell-restricted search.
  *
  * Determinism design: float components are quantized to micro-units
  * (floor(x·1e6+0.5) — floor is bit-deterministic where decimal-cast
  * half-rounding is not) and the dot product is an exact int64 fold, with
  * only the final cosine division in double — results are bit-identical
  * across engines (DuckDB oracle mirrors with generate_series joins).
  *
  * Scale design: brute-force is the correctness baseline (O(n·q) with a
  * broadcast query side); the IVF path assigns every vector to its nearest
  * coarse centroid (broadcast centroids — one pass) so queries probe one
  * cell, the classic inverted-file ANN layout. On a cluster, partition by
  * cell id and the probe is a partition-pruned scan.
  */
object Embeddings {

  /** micro-unit quantizer: floor(x·1e6 + 0.5) as int64. floor over
    * identical doubles is bit-deterministic in every engine — unlike
    * float→decimal casts, whose half-rounding rules differ exactly where
    * 7-significant-digit floats land.
    */
  def quant6(x: Column): Column =
    floor(x.cast("double") * 1e6 + 0.5).cast("long")

  /** exact int64 dot product of two float-array columns in micro-units:
    * |q| ≤ 1e6 → products ≤ 1e12, 64-element sums ≤ 6.4e13 ≪ 2^53, so
    * every int→double rendering is exact. Backed by the native codegen'd
    * [[graft.expressions.DotQuant6]] (one primitive loop per pair; the
    * zip_with/aggregate HOF form ran interpreted per element).
    */
  def dotDecimal(a: Column, b: Column): Column = call_function("dotq6", a, b)

  /** squared L2 norm, exact decimal. */
  def norm2Decimal(a: Column): Column = dotDecimal(a, a)

  /** cosine similarity rendered as double (single deterministic division
    * chain over exact decimal operands). A zero-norm vector NULLs the
    * result — DuckDB's native x/0 — instead of throwing under ANSI mode.
    */
  def cosine(dot: Column, n2a: Column, n2b: Column): Column = {
    val denom = sqrt(n2a.cast("double")) * sqrt(n2b.cast("double"))
    dot.cast("double") / when(denom === 0.0, lit(null).cast("double")).otherwise(denom)
  }

  /** vector as exact micro-unit int64 array (see [[quant6]]) — the
    * native one-pass [[graft.expressions.Quant6Array]]; the transform
    * lambda it replaced ran interpreted per component.
    */
  def quantArray(vec: Column): Column = call_function("quant6arr", vec)

  /** One Lloyd ASSIGNMENT step against integer centroids: every vector
    * goes to its nearest centroid by squared L2 distance, computed
    * entirely in exact int64 micro-units. Since ‖x‖² is constant per
    * vector, argmin ‖x−c‖² == argmin (‖c‖² − 2x·c) — the vector's own
    * norm never needs computing. Ties break on cell id. Centroids
    * BROADCAST (k rows); the scored frame is the only wide pass.
    *
    * The dot products run in the native codegen'd
    * [[graft.expressions.DotLongs]] — the interpreted zip_with/aggregate
    * fold cost 2 s/round at n·k = 80k pairs.
    */
  def assignToCentroids(vecs: DataFrame, cents: DataFrame): DataFrame = {
    val scored = vecs.crossJoin(broadcast(cents))
      .withColumn("dot", call_function("dotl", col("xq"), col("cq")))
      .withColumn("n2c", call_function("dotl", col("cq"), col("cq")))
      .withColumn("score", col("n2c") - lit(2L) * col("dot"))
    // argmin via min-of-struct, NOT a row_number window: the aggregate
    // partially combines map-side so only ~n pre-reduced rows shuffle,
    // where the window would shuffle and sort all n·k scored rows.
    // (score, cell) is a total order per vector (cells are distinct), so
    // the struct comparison never reaches the xq payload field.
    scored.groupBy(col("vec_id"))
      .agg(min(struct(col("score"), col("cell"), col("xq"))).as("best"))
      .select(col("vec_id"), col("best.cell").as("cell"),
        col("best.xq").as("xq"))
  }

  /** One Lloyd UPDATE step: component-wise integer mean of each cell's
    * members. Sums are exact int64 (micro-units × corpus size ≪ 2⁵³), the
    * mean is floor(sum/count) over the exact double rendering — floor is
    * bit-deterministic across engines where integer-division semantics
    * (truncate vs floor on negatives) are not. Cells that lost every
    * member simply disappear (both engines drop empty groups).
    */
  def updateCentroids(assign: DataFrame): DataFrame =
    assign.select(col("cell"), posexplode(col("xq")).as(Seq("pos", "comp")))
      .groupBy(col("cell"), col("pos"))
      .agg(sum(col("comp")).as("s"), count(lit(1)).as("c"))
      .withColumn("cqi",
        floor(col("s").cast("double") / col("c").cast("double")).cast("long"))
      .groupBy(col("cell"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("cqi")))),
        x => x.getField("cqi")).as("cq"))

  /** brute-force top-k: for each query vector, the k nearest others by
    * cosine, deterministic tie-break on neighbor id.
    */
  def topK(vecs: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = queries.as("q").join(vecs.as("v"),
        col("q.qid") =!= col("v.vid"))
      .withColumn("dot", dotDecimal(col("q.qvec"), col("v.vvec")))
      .withColumn("cosine", cosine(col("dot"), col("q.qn2"), col("v.vn2")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q.qid"))
      .orderBy(col("cosine").desc, col("v.vid").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q.qid").as("qid"), col("rank"),
        col("v.vid").as("neighbor"), col("cosine"))
  }

  /** IVF coarse assignment: every vector's max-dot cell among the given
    * centroids (deterministic tie-break on lower cell id) → (vec_id,
    * cell). Centroids broadcast; one linear scoring pass. The shared
    * index construction behind the `sim_ivf_*` family, cell purity, and
    * [[semanticDedup]].
    */
  def ivfAssign(e: DataFrame, cents: DataFrame): DataFrame = {
    val scored = e.crossJoin(broadcast(cents))
      .withColumn("dot", dotDecimal(col("embedding"), col("cvec")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id"))
      .orderBy(col("dot").desc, col("cid").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cid").as("cell"))
  }

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication"): semantic near-duplicate
    * PRUNING DECISIONS via cluster-restricted pairwise cosine. Cells
    * bound the pair space — the corpus never goes all-pairs; within a
    * cell a vector is pruned when it matches a LOWER-id member at
    * cosine ≥ tau (one representative per ε-ball survives, min-id
    * convention like the exact-dedup tier). Output: (vec_id, cell, kept
    * 1/0) — the full decision table, so the survivor set AND the prune
    * rate per cell are both one filter away.
    *
    * Scale shape: assignment is a broadcast-centroid linear pass; the
    * within-cell pair generation reuses [[Dedup.bandedPairs]] with the
    * cell as a single band, so a degenerate mega-cell star-pairs around
    * its min-id member instead of going quadratic
    * ([[Dedup.semMaxBucket]]); verification touches only candidate
    * pairs with exact int64 micro-unit cosine.
    */
  def semanticDedup(e: DataFrame, cents: DataFrame, tau: Double): DataFrame = {
    // the assignment feeds FOUR consumers (bucket stats, both pair
    // sides, the decision join); Spark has no plan-subtree CSE, so
    // without the persist each one re-runs the broadcast-score window
    val assign = graft.Caches.registerTransient(
      ivfAssign(e, cents)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val cands = Dedup.bandedPairs(
      assign.select(col("vec_id").as("id"), lit(0).as("band"),
        col("cell").as("bucket")),
      Dedup.semMaxBucket(e.sparkSession))
    val sides = e.select(col("vec_id"), col("embedding"),
      norm2Decimal(col("embedding")).as("n2"))
    val verified = cands
      .join(sides.select(col("vec_id").as("id_a"), col("embedding").as("va"),
        col("n2").as("n2a")), Seq("id_a"))
      .join(sides.select(col("vec_id").as("id_b"), col("embedding").as("vb"),
        col("n2").as("n2b")), Seq("id_b"))
      .withColumn("cosine",
        cosine(dotDecimal(col("va"), col("vb")), col("n2a"), col("n2b")))
      .filter(col("cosine") >= tau)
    val removed = verified.select(col("id_b").as("vec_id")).distinct()
    assign.join(removed.withColumn("hit", lit(1)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        when(col("hit").isNull, lit(1)).otherwise(lit(0)).as("kept"))
  }
}
