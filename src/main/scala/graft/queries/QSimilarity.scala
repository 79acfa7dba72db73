package graft.queries

import graft.Tables
import graft.llmdata.Embeddings
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table: exact-decimal cosine,
  * brute-force top-k baseline, IVF-style cell-restricted ANN, and
  * embedding-cosine near-duplicate pairs. All decimal-exact → DuckDB
  * oracles mirror via 1-based list indexing + generate_series.
  */
object QSimilarity extends Registry {

  /** exact decimal dot product in DuckDB via index join (1-based lists) */
  private def dotSql(a: String, b: String): String =
    s"""(SELECT sum(CAST(floor($a.embedding[CAST(i AS INT)] * 1e6 + 0.5e0) AS BIGINT)
                    * CAST(floor($b.embedding[CAST(i AS INT)] * 1e6 + 0.5e0) AS BIGINT))
         FROM generate_series(1, 64) g(i))"""

  /** norms CTE: vec_id, n2 (decimal) */
  private val normsSql =
    s"""norms AS (
         SELECT vec_id, (SELECT sum(CAST(floor(e.embedding[CAST(i AS INT)] * 1e6 + 0.5e0) AS BIGINT)
                                    * CAST(floor(e.embedding[CAST(i AS INT)] * 1e6 + 0.5e0) AS BIGINT))
                         FROM generate_series(1, 64) g(i)) AS n2
         FROM embeddings e)"""

  /** IVF index CTEs (cents → adot → assign): coarse centroids, every
    * vector's max-dot cell with deterministic tie-break. Shared by the
    * sim_ivf_* oracles so they all mirror the one index construction.
    */
  private val ivfIndexSql =
    s"""cents AS (
         SELECT vec_id AS cid, embedding FROM embeddings WHERE vec_id % 50 = 0),
       adot AS (
         SELECT e.vec_id, c.cid,
                (SELECT sum(CAST(floor(e.embedding[CAST(i AS INT)] * 1e6 + 0.5e0) AS BIGINT)
                            * CAST(floor(c.embedding[CAST(i AS INT)] * 1e6 + 0.5e0) AS BIGINT))
                 FROM generate_series(1, 64) g(i)) AS dot
         FROM embeddings e CROSS JOIN cents c),
       assign AS (
         SELECT vec_id, cid AS cell FROM (
           SELECT vec_id, cid,
                  row_number() OVER (PARTITION BY vec_id
                    ORDER BY dot DESC, cid) AS rn
           FROM adot) x WHERE rn = 1)"""

  /** probe-side CTE chain at a given `nprobe` (prefixed so two widths
    * coexist in one oracle): each query (vec_id < 5) searches its
    * `nprobe` best cells; `<pfx>ranked` carries (qid, rank, neighbor,
    * cosine), `<pfx>top` the rank ≤ 5 set.
    */
  private def ivfProbeSql(pfx: String, nprobe: Int) =
    s"""${pfx}cells AS (
         SELECT vec_id, cid AS cell FROM (
           SELECT vec_id, cid,
                  row_number() OVER (PARTITION BY vec_id
                    ORDER BY dot DESC, cid) AS rn
           FROM adot WHERE vec_id < 5) qc WHERE rn <= $nprobe),
       ${pfx}scored AS (
         SELECT q.vec_id AS qid, v.vec_id AS neighbor,
                CAST(${dotSql("q", "v")} AS DOUBLE)
                  / (sqrt(CAST(nq.n2 AS DOUBLE)) * sqrt(CAST(nv.n2 AS DOUBLE))) AS cosine
         FROM embeddings q
         JOIN ${pfx}cells qc ON qc.vec_id = q.vec_id
         JOIN assign av ON av.cell = qc.cell
         JOIN embeddings v ON v.vec_id = av.vec_id AND v.vec_id <> q.vec_id
         JOIN norms nq ON nq.vec_id = q.vec_id
         JOIN norms nv ON nv.vec_id = v.vec_id),
       ${pfx}ranked AS (
         SELECT qid, neighbor, cosine,
                row_number() OVER (PARTITION BY qid
                  ORDER BY cosine DESC, neighbor) AS rank
         FROM ${pfx}scored),
       ${pfx}top AS (
         SELECT qid, neighbor FROM ${pfx}ranked WHERE rank <= 5)"""

  /** IVF cell-restricted top-k per probe (vec_id < 5): coarse centroids =
    * vec_id % 50 = 0, max-dot assignment with deterministic tie-break.
    * Every vector lives in exactly ONE cell; a query searches its
    * `nprobe` best cells (by centroid dot, same tie-break) — nprobe = 1
    * is the classic single-cell probe, nprobe > 1 is multi-probe IVF,
    * trading a linear factor of scan for recall (the knob
    * `sim_ivf_recall` measures). Candidates stay duplicate-free by
    * construction (one cell per vector). Shared by `sim_ivf_topk`,
    * `sim_ivf_multiprobe` and the recall harness so the measured recall
    * is the recall of the exact operator that serves queries.
    */
  private def ivfTopK(s: org.apache.spark.sql.SparkSession, d: String,
      k: Int, nprobe: Int = 1): org.apache.spark.sql.DataFrame = {
    val e = Tables.embeddings(s, d)
    val scored = ivfScored(e, nprobe)
    val w2 = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("vid").asc)
    scored.withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vid").as("neighbor"), col("cosine"))
  }

  /** (qid, vid, cosine, qrn) — every query-vs-candidate cosine within
    * the query's `nprobe` best cells, with the probed cell's rank
    * (`qrn`) RETAINED: filtering `qrn <= m` for m ≤ nprobe yields
    * exactly the narrower probe's candidate set, so one index build and
    * one scoring pass serve every width (the recall harness derives
    * nprobe = 1 and 3 from a single nprobe = 3 frame instead of
    * building the index twice).
    */
  private def ivfScored(e: org.apache.spark.sql.DataFrame,
      nprobe: Int): org.apache.spark.sql.DataFrame = {
    val cents = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    def bestCells(src: org.apache.spark.sql.DataFrame, n: Int) = {
      val scored = src.crossJoin(broadcast(cents))
        .withColumn("dot",
          Embeddings.dotDecimal(col("embedding"), col("cvec")))
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("dot").desc, col("cid").asc)
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= n)
        .select(col("vec_id"), col("rn"), col("cid").as("cell"),
          col("embedding"))
    }
    val cands = bestCells(e, 1)
      .select(col("vec_id").as("vid"), col("cell"),
        col("embedding").as("vvec"),
        Embeddings.norm2Decimal(col("embedding")).as("vn2"))
    val queries = bestCells(e.filter(col("vec_id") < 5), nprobe)
      .select(col("vec_id").as("qid"), col("rn").as("qrn"), col("cell"),
        col("embedding").as("qvec"),
        Embeddings.norm2Decimal(col("embedding")).as("qn2"))
    queries.join(cands, Seq("cell")).filter(col("qid") =!= col("vid"))
      .withColumn("cosine", Embeddings.cosine(
        Embeddings.dotDecimal(col("qvec"), col("vvec")),
        col("qn2"), col("vn2")))
      .select(col("qid"), col("vid"), col("cosine"), col("qrn"))
  }

  def qs: Seq[Q] = Seq(

    // Brute-force top-k cosine (the exact baseline): queries vec_id < 5,
    // k = 10, deterministic tie-break on neighbor id.
    Q("sim_topk_bruteforce",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val vecs = e.select(col("vec_id").as("vid"), col("embedding").as("vvec"),
          Embeddings.norm2Decimal(col("embedding")).as("vn2"))
        val queries = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
            Embeddings.norm2Decimal(col("embedding")).as("qn2"))
        Embeddings.topK(vecs, queries, k = 10)
      },
      Some(s"""WITH $normsSql,
              scored AS (
                SELECT q.vec_id AS qid, v.vec_id AS neighbor,
                       CAST(${dotSql("q", "v")} AS DOUBLE)
                         / (sqrt(CAST(nq.n2 AS DOUBLE)) * sqrt(CAST(nv.n2 AS DOUBLE))) AS cosine
                FROM embeddings q
                JOIN embeddings v ON q.vec_id <> v.vec_id
                JOIN norms nq ON nq.vec_id = q.vec_id
                JOIN norms nv ON nv.vec_id = v.vec_id
                WHERE q.vec_id < 5),
              ranked AS (
                SELECT qid, neighbor, cosine,
                       row_number() OVER (PARTITION BY qid
                         ORDER BY cosine DESC, neighbor) AS rank
                FROM scored)
              SELECT qid, rank, neighbor, cosine FROM ranked WHERE rank <= 10""")),

    // MATRYOSHKA truncation recall (ext.) — MRL-style embeddings are
    // trained so a PREFIX of the vector is itself a usable embedding;
    // serving then scores candidates on the first m dims (4× less
    // memory bandwidth and ADC work at m=16/64) and pays a measured
    // recall cost. This rig is that measurement: top-10 by 16-dim
    // prefix cosine vs the full 64-dim truth, recall@10 per query in
    // exact integer milli (n_hits × 100). Same quantized-dot machinery
    // as the rest of the ANN ladder — the truncation is a zero-copy
    // `slice()` on the stored vector, no re-embedding pass.
    Q("sim_matryoshka_recall",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        def sides(dims: Option[Int]) = {
          val v = dims.map(m => slice(col("embedding"), 1, m))
            .getOrElse(col("embedding"))
          (e.select(col("vec_id").as("vid"), v.as("vvec"),
              Embeddings.norm2Decimal(v).as("vn2")),
            e.filter(col("vec_id") < 5)
              .select(col("vec_id").as("qid"), v.as("qvec"),
                Embeddings.norm2Decimal(v).as("qn2")))
        }
        val (v64, q64) = sides(None)
        val (v16, q16) = sides(Some(16))
        val truth = Embeddings.topK(v64, q64, k = 10)
          .select(col("qid"), col("neighbor"))
        val approx = Embeddings.topK(v16, q16, k = 10)
          .select(col("qid"), col("neighbor"))
        val hits = truth.join(approx, Seq("qid", "neighbor"), "left_semi")
          .groupBy(col("qid")).agg(count(lit(1)).as("n_hits"))
        truth.select(col("qid")).distinct()
          .join(hits, Seq("qid"), "left")
          .select(col("qid"),
            coalesce(col("n_hits"), lit(0L)).as("n_hits"),
            (coalesce(col("n_hits"), lit(0L)) * 100).as("recall_milli"))
      },
      Some {
        def dotm(a: String, b: String, m: Int) =
          s"""(SELECT sum(CAST(floor($a.embedding[CAST(i AS INT)] * 1e6 + 0.5e0) AS BIGINT)
                          * CAST(floor($b.embedding[CAST(i AS INT)] * 1e6 + 0.5e0) AS BIGINT))
               FROM generate_series(1, $m) g(i))"""
        def ranked(m: Int, name: String) =
          s"""n$m AS (
                SELECT vec_id, (SELECT sum(CAST(floor(e.embedding[CAST(i AS INT)] * 1e6 + 0.5e0) AS BIGINT)
                                           * CAST(floor(e.embedding[CAST(i AS INT)] * 1e6 + 0.5e0) AS BIGINT))
                                FROM generate_series(1, $m) g(i)) AS n2
                FROM embeddings e),
              s$m AS (
                SELECT q.vec_id AS qid, v.vec_id AS neighbor,
                       CAST(${dotm("q", "v", m)} AS DOUBLE)
                         / (sqrt(CAST(nq.n2 AS DOUBLE)) * sqrt(CAST(nv.n2 AS DOUBLE))) AS cosine
                FROM embeddings q
                JOIN embeddings v ON q.vec_id <> v.vec_id
                JOIN n$m nq ON nq.vec_id = q.vec_id
                JOIN n$m nv ON nv.vec_id = v.vec_id
                WHERE q.vec_id < 5),
              $name AS (
                SELECT qid, neighbor FROM (
                  SELECT qid, neighbor,
                         row_number() OVER (PARTITION BY qid
                           ORDER BY cosine DESC, neighbor) AS rank
                  FROM s$m) x WHERE rank <= 10)"""
        s"""WITH ${ranked(64, "r64")},
              ${ranked(16, "r16")},
              hits AS (SELECT t.qid, count(*) AS n_hits
                       FROM r64 t JOIN r16 c
                         ON c.qid = t.qid AND c.neighbor = t.neighbor
                       GROUP BY 1)
              SELECT q.qid, CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
                     CAST(coalesce(h.n_hits, 0) * 100 AS BIGINT) AS recall_milli
              FROM (SELECT DISTINCT qid FROM r64) q
              LEFT JOIN hits h ON h.qid = q.qid"""
      }),

    // IVF-style ANN: coarse centroids = vec_id % 50 = 0; every vector is
    // assigned to its max-dot centroid (deterministic tie-break); queries
    // (vec_id < 5) probe ONLY their own cell — the inverted-file layout
    // that partition-prunes at cluster scale.
    Q("sim_ivf_topk",
      (s, d) => ivfTopK(s, d, k = 5),
      Some(s"""WITH $ivfIndexSql, $normsSql, ${ivfProbeSql("q", 1)}
              SELECT qid, rank, neighbor, cosine FROM qranked WHERE rank <= 5""")),

    // Multi-probe IVF — the recall knob `sim_ivf_recall` measures: a
    // query searches its nprobe = 3 best cells instead of 1, trading a
    // ~3× bounded candidate scan for the recall the single-cell probe
    // leaves behind. Same index, same verify math; at cluster scale the
    // probed cells are partition-pruned reads just like nprobe = 1.
    Q("sim_ivf_multiprobe",
      (s, d) => ivfTopK(s, d, k = 5, nprobe = 3),
      Some(s"""WITH $ivfIndexSql, $normsSql, ${ivfProbeSql("q", 3)}
              SELECT qid, rank, neighbor, cosine FROM qranked WHERE rank <= 5""")),

    // Embedding-cosine near-duplicate pairs (tier 4 of the dedup ladder):
    // all pairs with cosine ≥ 0.22 among vec_id < 200 (bounded pair space;
    // the LSH/IVF tiers are the scale path).
    Q("sim_embedding_neardup",
      (s, d) => {
        val e = Tables.embeddings(s, d).filter(col("vec_id") < 200)
          .select(col("vec_id"), col("embedding"),
            Embeddings.norm2Decimal(col("embedding")).as("n2"))
        val a = e.select(col("vec_id").as("id_a"), col("embedding").as("va"),
          col("n2").as("n2a"))
        val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vb"),
          col("n2").as("n2b"))
        a.crossJoin(b).filter(col("id_a") < col("id_b"))
          .withColumn("cosine", Embeddings.cosine(
            Embeddings.dotDecimal(col("va"), col("vb")),
            col("n2a"), col("n2b")))
          .filter(col("cosine") >= 0.22)
          .select(col("id_a"), col("id_b"), col("cosine"))
      },
      Some(s"""WITH $normsSql,
              pairs AS (
                SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                       CAST(${dotSql("a", "b")} AS DOUBLE)
                         / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cosine
                FROM embeddings a
                JOIN embeddings b ON a.vec_id < b.vec_id AND b.vec_id < 200
                JOIN norms na ON na.vec_id = a.vec_id
                JOIN norms nb ON nb.vec_id = b.vec_id
                WHERE a.vec_id < 200)
              SELECT id_a, id_b, cosine FROM pairs WHERE cosine >= 0.22e0""")),

    // Random-hyperplane LSH near-dup — the SCALE path for embedding
    // near-duplicates (the brute-force tier above is the bounded
    // baseline): 16 deterministic integer hyperplanes (weights from the
    // md5 hash family, so the oracle reproduces them exactly), sign bits
    // banded 4×4; vectors sharing any band key become candidates, then
    // exact quantized cosine ≥ 0.4 verifies. Candidate generation is
    // linear + collisions — never the O(n²) pair space. Band geometry is
    // tuned to this corpus's LOW-similarity regime (max cosine ≈ 0.5):
    // production near-dup at cosine ≥ 0.9 would use 8-bit bands, where
    // RHP collision probability (1 − θ/π per bit) turns razor-selective.
    Q("sim_rhp_neardup",
      (s, d) => {
        import graft.llmdata.Embeddings
        // the 16×64 integer plane weights are baked into the native
        // codegen'd [[graft.expressions.RhpBandKeys]] (same Md5Prefix60
        // family the oracle mirrors): the whole 16-plane signature is ONE
        // shuffle-free primitive-loop projection per vector. The earlier
        // 16× aggregate(zip_with(...)) HOF form ran interpreted per
        // element (~1024 boxed ops/row) and dominated the bench.
        val keys = graft.llmdata.Dedup.rhpBandKeys(Tables.embeddings(s, d))
        // occupancy-capped candidate generation (Dedup.bandedPairs):
        // 4-bit band keys make RHP buckets wide by construction — at the
        // 5x near-dup probe a single bucket holds 1,100 vectors (13.3M
        // clique pairs); over rhpMaxBucket the bucket star-pairs around
        // its min-id member. Never fires at oracle or bench geometry
        // (max occupancy 57 at sf0.01, 220 at sf0.1 < 256 default —
        // pinned by LshCapSpec).
        val cands = graft.llmdata.Dedup.bandedPairs(
          keys, graft.llmdata.Dedup.rhpMaxBucket(s))
        val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"),
          Embeddings.norm2Decimal(col("embedding")).as("n2"))
        cands
          .join(e.select(col("vec_id").as("id_a"), col("embedding").as("va"),
            col("n2").as("n2a")), Seq("id_a"))
          .join(e.select(col("vec_id").as("id_b"), col("embedding").as("vb"),
            col("n2").as("n2b")), Seq("id_b"))
          .withColumn("cosine", Embeddings.cosine(
            Embeddings.dotDecimal(col("va"), col("vb")), col("n2a"), col("n2b")))
          .filter(col("cosine") >= 0.4)
          .select(col("id_a"), col("id_b"), col("cosine"))
      },
      Some(s"""WITH planes AS (
                SELECT j, i,
                       CAST('0x' || substr(md5('p:' || j || ':' || i), 1, 15) AS BIGINT)
                         % 2001 - 1000 AS w
                FROM generate_series(0, 15) g(j)
                CROSS JOIN generate_series(0, 63) h(i)),
              comps AS (
                SELECT vec_id, CAST(i AS INT) AS i,
                       CAST(floor(embedding[CAST(i + 1 AS INT)] * 1e6 + 0.5e0) AS BIGINT) AS q
                FROM embeddings CROSS JOIN generate_series(0, 63) g(i)),
              bits AS (
                SELECT vec_id, j,
                       CASE WHEN sum(q * w) >= 0 THEN 1 ELSE 0 END AS bit
                FROM comps JOIN planes ON planes.i = comps.i
                GROUP BY vec_id, j),
              bkeys AS (
                SELECT vec_id, CAST(j // 4 AS INT) AS band,
                       sum(bit << CAST(j % 4 AS INT)) AS bkey
                FROM bits GROUP BY 1, 2),
              cands AS (
                SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
                FROM bkeys a JOIN bkeys b
                  ON a.band = b.band AND a.bkey = b.bkey AND a.vec_id < b.vec_id),
              $normsSql
              SELECT c.id_a, c.id_b,
                     CAST(${dotSql("a", "b")} AS DOUBLE)
                       / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cosine
              FROM cands c
              JOIN embeddings a ON a.vec_id = c.id_a
              JOIN embeddings b ON b.vec_id = c.id_b
              JOIN norms na ON na.vec_id = c.id_a
              JOIN norms nb ON nb.vec_id = c.id_b
              WHERE CAST(${dotSql("a", "b")} AS DOUBLE)
                      / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) >= 0.4e0""")),

    // K-means clustering (two exact Lloyd rounds): seed centroids =
    // vec_id % 50 == 0, assignment by squared-L2 argmin computed entirely
    // in int64 micro-units (argmin ‖x−c‖² == argmin (‖c‖² − 2x·c): the
    // vector's own norm cancels), centroid update = component-wise
    // floor-mean in the same integer space — every step bit-reproducible
    // in DuckDB, so the oracle replays BOTH rounds. Scale shape: k
    // centroids broadcast; the assignment pass is linear per round; the
    // update shuffles (cell, pos) partial sums — dim·k rows after
    // map-side combine. This is the centroid-training counterpart to
    // sim_ivf_topk's fixed-seed inverted file.
    Q("sim_kmeans_assign",
      (s, d) => {
        val vecs = graft.Caches.registerTransient(
          Tables.embeddings(s, d)
            .select(col("vec_id"),
              Embeddings.quantArray(col("embedding")).as("xq"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        val cents0 = vecs.filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("cell"), col("xq").as("cq"))
        val a0 = Embeddings.assignToCentroids(vecs, cents0)
        val cents1 = Embeddings.updateCentroids(a0)
        val a1 = Embeddings.assignToCentroids(vecs, cents1)
        a1.select(col("vec_id"), col("cell"))
      },
      Some {
        def scoreSql(cents: String) =
          s"""SELECT v.vec_id, c.cell,
                (SELECT sum(c.cq[CAST(i AS INT)] * c.cq[CAST(i AS INT)])
                 FROM generate_series(1, 64) g(i))
                - 2 * (SELECT sum(v.xq[CAST(i AS INT)] * c.cq[CAST(i AS INT)])
                       FROM generate_series(1, 64) g(i)) AS score
              FROM q v CROSS JOIN $cents c"""
        def argminSql(scored: String) =
          s"""SELECT vec_id, cell FROM (
                SELECT vec_id, cell,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY score, cell) AS rn
                FROM $scored) r WHERE rn = 1"""
        s"""WITH q AS (
              SELECT vec_id,
                     list_transform(embedding,
                       x -> CAST(floor(x * 1e6 + 0.5e0) AS BIGINT)) AS xq
              FROM embeddings),
            c0 AS (SELECT vec_id AS cell, xq AS cq FROM q WHERE vec_id % 50 = 0),
            s0 AS (${scoreSql("c0")}),
            a0 AS (${argminSql("s0")}),
            m1 AS (SELECT a.cell, g.i AS pos,
                     CAST(floor(CAST(sum(v.xq[CAST(g.i AS INT)]) AS DOUBLE)
                                / CAST(count(*) AS DOUBLE)) AS BIGINT) AS cqi
                   FROM a0 a JOIN q v USING (vec_id)
                   CROSS JOIN generate_series(1, 64) g(i)
                   GROUP BY a.cell, g.i),
            c1 AS (SELECT cell, list(cqi ORDER BY pos) AS cq FROM m1 GROUP BY cell),
            s1 AS (${scoreSql("c1")}),
            a1 AS (${argminSql("s1")})
            SELECT vec_id, cell FROM a1"""
      }),

    // Clustering evaluation harness — per-cell label PURITY of the IVF
    // index against the table's ground-truth `label` column: for every
    // cell, the majority label's share of the cell (tie-break: higher
    // count, then lower label). The standard external clustering metric;
    // with the recall harness it completes the evaluation story — recall
    // measures the SEARCH quality of the index, purity its SEMANTIC
    // quality. One hash-agg over the assignment — scales like any
    // low-cardinality groupBy.
    Q("sim_cell_purity",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val cents = e.filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
        val scored = e.crossJoin(broadcast(cents))
          .withColumn("dot",
            Embeddings.dotDecimal(col("embedding"), col("cvec")))
        val w = Window.partitionBy(col("vec_id"))
          .orderBy(col("dot").desc, col("cid").asc)
        val assign = scored.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("vec_id"), col("cid").as("cell"),
            col("label").cast("long").as("label"))
        val byLabel = assign.groupBy(col("cell"), col("label"))
          .agg(count(lit(1)).as("n"))
        val wTop = Window.partitionBy(col("cell"))
          .orderBy(col("n").desc, col("label").asc)
        val top = byLabel.withColumn("rnk", row_number().over(wTop))
          .filter(col("rnk") === 1)
          .select(col("cell"), col("label").as("top_label"), col("n").as("n_top"))
        val sizes = assign.groupBy(col("cell"))
          .agg(count(lit(1)).as("n_vecs"))
        sizes.join(top, Seq("cell"))
          .withColumn("purity",
            col("n_top").cast("double") / col("n_vecs").cast("double"))
          .select(col("cell"), col("n_vecs"), col("top_label"),
            col("n_top"), col("purity"))
      },
      Some(s"""WITH $ivfIndexSql,
              lab AS (
                SELECT a.cell, CAST(e.label AS BIGINT) AS label
                FROM assign a JOIN embeddings e ON e.vec_id = a.vec_id),
              byl AS (
                SELECT cell, label, count(*) AS n
                FROM lab GROUP BY cell, label),
              top AS (
                SELECT cell, label AS top_label, n AS n_top FROM (
                  SELECT cell, label, n,
                         row_number() OVER (PARTITION BY cell
                           ORDER BY n DESC, label) AS rnk
                  FROM byl) x WHERE rnk = 1),
              sz AS (SELECT cell, count(*) AS n_vecs FROM lab GROUP BY cell)
              SELECT sz.cell, sz.n_vecs, top.top_label, top.n_top,
                     CAST(top.n_top AS DOUBLE) / CAST(sz.n_vecs AS DOUBLE) AS purity
              FROM sz JOIN top ON top.cell = sz.cell""")),

    // ANN evaluation harness — recall@5 of the IVF tier against the
    // exact brute-force ground truth, per probe, at BOTH probe widths
    // (nprobe = 1 and 3). The number every ANN deployment watches: how
    // much answer quality the cell restriction trades for its
    // partition-pruned scan, and how much multi-probe buys back. All
    // sides use the SAME deterministic tie-break (cosine DESC, neighbor
    // ASC), so the top-5 SETS — and hence recall — are exactly
    // reproducible in DuckDB. At 100 TB this runs exactly as written
    // over a SAMPLED probe set: the ground-truth pass is one linear
    // broadcast-probe scan per sample, the IVF side is the production
    // operator unchanged.
    Q("sim_ivf_recall",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val vecs = e.select(col("vec_id").as("vid"), col("embedding").as("vvec"),
          Embeddings.norm2Decimal(col("embedding")).as("vn2"))
        val queries = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
            Embeddings.norm2Decimal(col("embedding")).as("qn2"))
        val truth = Embeddings.topK(vecs, queries, k = 5)
          .select(col("qid"), col("neighbor"))
        // ONE index build + scoring pass at the widest probe (persisted
        // — Spark has no plan-subtree CSE, so both width branches would
        // otherwise re-walk the assignment); each width's top-5 re-ranks
        // its own qrn-filtered candidate subset
        val scoredAll = graft.Caches.registerTransient(
          ivfScored(e, nprobe = 3)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        def hitsAt(nprobe: Int, as: String) = {
          val w = Window.partitionBy(col("qid"))
            .orderBy(col("cosine").desc, col("vid").asc)
          scoredAll.filter(col("qrn") <= nprobe)
            .withColumn("rank", row_number().over(w))
            .filter(col("rank") <= 5)
            .select(col("qid"), col("vid").as("neighbor"))
            .join(truth, Seq("qid", "neighbor"), "left_semi")
            .groupBy(col("qid")).agg(count(lit(1)).as(as))
        }
        queries.select(col("qid"))
          .join(hitsAt(1, "n_hits"), Seq("qid"), "left")
          .join(hitsAt(3, "n_hits_p3"), Seq("qid"), "left")
          .select(col("qid"),
            coalesce(col("n_hits"), lit(0L)).as("n_hits"),
            coalesce(col("n_hits_p3"), lit(0L)).as("n_hits_p3"))
          .withColumn("recall", col("n_hits").cast("double") / lit(5.0d))
          .withColumn("recall_p3", col("n_hits_p3").cast("double") / lit(5.0d))
      },
      Some(s"""WITH $normsSql, $ivfIndexSql,
              bfscored AS (
                SELECT q.vec_id AS qid, v.vec_id AS neighbor,
                       CAST(${dotSql("q", "v")} AS DOUBLE)
                         / (sqrt(CAST(nq.n2 AS DOUBLE)) * sqrt(CAST(nv.n2 AS DOUBLE))) AS cosine
                FROM embeddings q
                JOIN embeddings v ON q.vec_id <> v.vec_id
                JOIN norms nq ON nq.vec_id = q.vec_id
                JOIN norms nv ON nv.vec_id = v.vec_id
                WHERE q.vec_id < 5),
              bf AS (
                SELECT qid, neighbor FROM (
                  SELECT qid, neighbor,
                         row_number() OVER (PARTITION BY qid
                           ORDER BY cosine DESC, neighbor) AS rank
                  FROM bfscored) x WHERE rank <= 5),
              ${ivfProbeSql("p1", 1)},
              ${ivfProbeSql("p3", 3)},
              h1 AS (
                SELECT i.qid, count(*) AS n_hits
                FROM p1top i JOIN bf b ON b.qid = i.qid AND b.neighbor = i.neighbor
                GROUP BY i.qid),
              h3 AS (
                SELECT i.qid, count(*) AS n_hits
                FROM p3top i JOIN bf b ON b.qid = i.qid AND b.neighbor = i.neighbor
                GROUP BY i.qid)
              SELECT q.vec_id AS qid,
                     CAST(coalesce(h1.n_hits, 0) AS BIGINT) AS n_hits,
                     CAST(coalesce(h3.n_hits, 0) AS BIGINT) AS n_hits_p3,
                     CAST(coalesce(h1.n_hits, 0) AS DOUBLE) / 5 AS recall,
                     CAST(coalesce(h3.n_hits, 0) AS DOUBLE) / 5 AS recall_p3
              FROM embeddings q
              LEFT JOIN h1 ON h1.qid = q.vec_id
              LEFT JOIN h3 ON h3.qid = q.vec_id
              WHERE q.vec_id < 5""")),

    // Semantic dedup (SemDeDup): cluster-restricted cosine pruning over
    // the FULL corpus — the scale path between doc-level near-dup and
    // brute-force embedding pairs. The IVF cells bound the pair space
    // (never all-pairs); within a cell a vector is pruned when it
    // matches a lower-id member at cosine ≥ 0.3. Output is the complete
    // decision table (vec_id, cell, kept), so survivor set and per-cell
    // prune rate are both one filter away. The oracle replays the same
    // index (shared ivfIndexSql), the same within-cell pair space, and
    // the same exact-decimal verify — 168 of 500 pruned at sf0.01.
    Q("dd_semantic",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val cents = e.filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
        Embeddings.semanticDedup(e, cents, tau = 0.3)
      },
      Some(s"""WITH $ivfIndexSql, $normsSql,
              pairs AS (
                SELECT a.vec_id AS id_a, b.vec_id AS id_b
                FROM assign a JOIN assign b
                  ON a.cell = b.cell AND a.vec_id < b.vec_id),
              verified AS (
                SELECT p.id_a, p.id_b
                FROM pairs p
                JOIN embeddings a ON a.vec_id = p.id_a
                JOIN embeddings b ON b.vec_id = p.id_b
                JOIN norms na ON na.vec_id = p.id_a
                JOIN norms nb ON nb.vec_id = p.id_b
                WHERE CAST(${dotSql("a", "b")} AS DOUBLE)
                        / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) >= 0.3e0),
              removed AS (SELECT DISTINCT id_b AS vec_id FROM verified)
              SELECT s.vec_id, s.cell,
                     CASE WHEN r.vec_id IS NULL THEN 1 ELSE 0 END AS kept
              FROM assign s LEFT JOIN removed r USING (vec_id)"""))
  ,

    // Product-quantization ENCODE (Jégou et al., "Product Quantization
    // for Nearest Neighbor Search") — the compression half of the
    // IVF-PQ layout that serves ANN at 100 TB: the 64-dim vector splits
    // into 4×16-dim subspaces, each assigned to its nearest sub-
    // codeword by exact int64 micro-unit L2 (same deterministic 1-in-50
    // seed codebooks and the same native dotl argmin as the k-means
    // tier), so every vector compresses to a 4-code tuple. One pass:
    // the subspaces EXPLODE per row (4 rows/vec), codewords broadcast
    // per subspace tag, map-side-combined min-struct argmin, then a
    // pivot back to one (vec_id, c0..c3) row — the corpus never
    // shuffles more than its 4-slice relation, and at scale the codes
    // table IS the index payload (4 bytes/vec instead of 256).
    Q("sim_pq_encode",
      (s, d) => {
        // persisted: pqAssign consumes subs twice (centroid derivation
        // + the probe side of the join) — unpersisted, the embeddings
        // scan and quantization would run twice
        val subs = graft.Caches.registerTransient(pqSubspaces(s, d)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        val best = pqAssign(subs)
        best.groupBy(col("vec_id")).agg(
          max(when(col("m") === 0, col("code"))).as("c0"),
          max(when(col("m") === 1, col("code"))).as("c1"),
          max(when(col("m") === 2, col("code"))).as("c2"),
          max(when(col("m") === 3, col("code"))).as("c3"))
      },
      Some(s"""WITH $pqCteSql
            SELECT vec_id,
                   max(CASE WHEN m = 0 THEN cell END) AS c0,
                   max(CASE WHEN m = 1 THEN cell END) AS c1,
                   max(CASE WHEN m = 2 THEN cell END) AS c2,
                   max(CASE WHEN m = 3 THEN cell END) AS c3
            FROM best GROUP BY vec_id""")),

    // PQ ADC search — the lookup half of IVF-PQ (asymmetric distance
    // computation): each query keeps its EXACT subvectors and
    // precomputes a distance TABLE to every sub-codeword (4×10 rows per
    // query — constant, broadcastable at any corpus size); every
    // encoded vector is then scored by FOUR table lookups summed, never
    // a full dot product against raw vectors. This is why PQ serves at
    // 100 TB: the scan touches only the 4-code tuples, the distance
    // math is per-query-constant, and the exact vectors are needed for
    // queries alone. Same int64 micro-units end-to-end; per-subspace
    // partial = ‖c‖² − 2·qs·cs (the query's own norm is rank-constant).
    // Top-5 per query, tie-broken on neighbor id.
    Q("sim_pq_adc_topk",
      (s, d) => pqAdcRanked(s, d)
        .filter(col("rank") <= 5)
        .select(col("qid"), col("rank"), col("vec_id").as("neighbor"),
          col("adc_score")),
      Some(s"""WITH $pqCteSql, $pqAdcCteSql
            SELECT qid, rank, vec_id AS neighbor, adc_score
            FROM pqranked WHERE rank <= 5""")),

    // PQ recall evaluation — the accuracy ledger of the 64:4
    // compression, mirroring sim_ivf_recall's shape: exact int64 L2
    // top-5 (over the same quantized vectors, so metric and data agree)
    // is the ground truth; the ADC top-5's hit count per query is the
    // recall. Run next to the encoder wherever PQ is deployed — the
    // compression ratio is meaningless without its recall cost on the
    // same corpus.
    Q("sim_pq_recall",
      (s, d) => {
        val truth = pqExactTruth(s, d)
        val hits = pqAdcRanked(s, d).filter(col("rank") <= 5)
          .select(col("qid"), col("vec_id").as("neighbor"))
          .join(truth, Seq("qid", "neighbor"), "left_semi")
          .groupBy(col("qid")).agg(count(lit(1)).as("n_hits"))
        truth.select(col("qid")).distinct()
          .join(hits, Seq("qid"), "left")
          .select(col("qid"),
            coalesce(col("n_hits"), lit(0L)).as("n_hits"),
            (coalesce(col("n_hits"), lit(0L)).cast("double") / lit(5.0d))
              .as("recall"))
      },
      Some(s"""WITH $pqCteSql, $pqAdcCteSql, $pqExactSql,
            hits AS (
              SELECT p.qid, count(*) AS n_hits
              FROM (SELECT qid, vec_id FROM pqranked WHERE rank <= 5) p
              JOIN exact e ON e.qid = p.qid AND e.neighbor = p.vec_id
              GROUP BY 1)
            SELECT e.qid,
                   coalesce(h.n_hits, 0) AS n_hits,
                   CAST(coalesce(h.n_hits, 0) AS DOUBLE) / 5e0 AS recall
            FROM (SELECT DISTINCT qid FROM exact) e
            LEFT JOIN hits h USING (qid)""")),

    // IVF-PQ composition — the actual 100 TB ANN serving layout the two
    // halves promise: coarse IVF cells bound the candidate set (nprobe=3
    // best cells per query), PQ ADC table lookups score the candidates.
    // Every per-query structure (centroids, probe cells, distance
    // tables) is broadcast; only the cell-bounded candidate codes flow
    // through a shuffle. Top-5 per query, ADC-score ascending,
    // tie-broken on neighbor id.
    Q("sim_ivfpq_topk",
      (s, d) => ivfpqRanked(s, d)
        .filter(col("rank") <= 5)
        .select(col("qid"), col("rank"), col("vec_id").as("neighbor"),
          col("adc_score")),
      Some(s"""WITH $pqCteSql, $pqAdcCteSql, $ivfpqCteSql
            SELECT qid, rank, vec_id AS neighbor, adc_score
            FROM ipqranked WHERE rank <= 5""")),

    // IVF-PQ recall vs exact int64 L2 truth over the same quantized
    // vectors — prices BOTH approximations at once (cell restriction ×
    // code compression), next to sim_ivf_recall (cells only) and
    // sim_pq_recall (codes only), so the compound accuracy cost of the
    // serving layout is measured, not inferred.
    Q("sim_ivfpq_recall",
      (s, d) => {
        val truth = pqExactTruth(s, d)
        val hits = ivfpqRanked(s, d).filter(col("rank") <= 5)
          .select(col("qid"), col("vec_id").as("neighbor"))
          .join(truth, Seq("qid", "neighbor"), "left_semi")
          .groupBy(col("qid")).agg(count(lit(1)).as("n_hits"))
        truth.select(col("qid")).distinct()
          .join(hits, Seq("qid"), "left")
          .select(col("qid"),
            coalesce(col("n_hits"), lit(0L)).as("n_hits"),
            (coalesce(col("n_hits"), lit(0L)).cast("double") / lit(5.0d))
              .as("recall"))
      },
      Some(s"""WITH $pqCteSql, $pqAdcCteSql, $ivfpqCteSql, $pqExactSql,
            hits AS (
              SELECT p.qid, count(*) AS n_hits
              FROM (SELECT qid, vec_id FROM ipqranked WHERE rank <= 5) p
              JOIN exact e ON e.qid = p.qid AND e.neighbor = p.vec_id
              GROUP BY 1)
            SELECT e.qid,
                   coalesce(h.n_hits, 0) AS n_hits,
                   CAST(coalesce(h.n_hits, 0) AS DOUBLE) / 5e0 AS recall
            FROM (SELECT DISTINCT qid FROM exact) e
            LEFT JOIN hits h USING (qid)"""))
  )

  /** Exact top-5 ground truth (qid, neighbor) by int64 L2 over the SAME
    * quantized vectors the PQ family encodes — shared by `sim_pq_recall`
    * and `sim_ivfpq_recall` so both harnesses grade against one truth.
    */
  private def pqExactTruth(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val vecs = Tables.embeddings(s, d)
      .select(col("vec_id"),
        Embeddings.quantArray(col("embedding")).as("xq"))
    val q = vecs.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("xq").as("qx"))
    val scored = q.crossJoin(vecs)
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("score",
        call_function("dotl", col("xq"), col("xq")) -
          lit(2L) * call_function("dotl", col("qx"), col("xq")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid"))
      .orderBy(col("score").asc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("qid"), col("vec_id").as("neighbor"))
  }

  /** DuckDB `exact` CTE matching [[pqExactTruth]] (expects [[pqCteSql]]
    * in scope for `q`).
    */
  private val pqExactSql: String =
    """exact AS (
         SELECT qid, vec_id AS neighbor FROM (
           SELECT q.vec_id AS qid, v.vec_id,
                  row_number() OVER (PARTITION BY q.vec_id
                    ORDER BY (SELECT sum(v.xq[CAST(i AS INT)] * v.xq[CAST(i AS INT)])
                              FROM generate_series(1, 64) g(i))
                             - 2 * (SELECT sum(q.xq[CAST(i AS INT)] * v.xq[CAST(i AS INT)])
                                    FROM generate_series(1, 64) g(i)) ASC,
                             v.vec_id ASC) AS rank
           FROM q
           JOIN q v ON v.vec_id <> q.vec_id
           WHERE q.vec_id < 5) r WHERE rank <= 5)"""

  /** (vec_id, rn, cell) — each source vector's best-`n` coarse IVF
    * cells (dot-ranked against the broadcast 1-in-50 centroids, same
    * tie-break as [[ivfScored]]) WITHOUT the scoring tail — the
    * assignment half shared by the IVF-PQ composition.
    */
  private def ivfCells(e: org.apache.spark.sql.DataFrame,
      src: org.apache.spark.sql.DataFrame, n: Int): org.apache.spark.sql.DataFrame = {
    val cents = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val scored = src.crossJoin(broadcast(cents))
      .withColumn("dot", Embeddings.dotDecimal(col("embedding"), col("cvec")))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("dot").desc, col("cid").asc)
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= n)
      .select(col("vec_id"), col("rn"), col("cid").as("cell"))
  }

  /** IVF-PQ-ranked neighbors (qid, rank, vec_id, adc_score): the
    * composed 100 TB ANN serving layout — coarse IVF cells bound the
    * candidate set (each query probes its `nprobe` best cells), then
    * candidates are scored by PQ ADC table lookups, never a raw-vector
    * dot product. Joins: centroids/distance-tables/probe-cells are all
    * broadcast (per-query-constant size at ANY corpus scale); the only
    * shuffles are the per-vector window for coarse assignment and the
    * (qid, vec_id) score aggregation over the cell-bounded candidate
    * codes. Encodes RAW vectors, not per-cell residuals — the
    * IVFFlat-style simplification of Jegou et al. 2011's residual
    * encoding, chosen so the codes are cell-independent and one
    * codebook serves every cell; `sim_ivfpq_recall` prices the
    * accuracy cost honestly.
    */
  private def ivfpqRanked(s: org.apache.spark.sql.SparkSession, d: String,
      nprobe: Int = 3): org.apache.spark.sql.DataFrame = {
    val e = Tables.embeddings(s, d)
    val subs = graft.Caches.registerTransient(pqSubspaces(s, d)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val codes = pqAssign(subs)
    val dtable = subs.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("m"), col("xs").as("qs"))
      .join(broadcast(pqCentroids(subs)), Seq("m"))
      .select(col("qid"), col("m"), col("cell").as("code"),
        (call_function("dotl", col("cs"), col("cs")) -
          lit(2L) * call_function("dotl", col("qs"), col("cs")))
          .as("pdist"))
    val cells = ivfCells(e, e, 1).select(col("vec_id"), col("cell"))
    val qcells = ivfCells(e, e.filter(col("vec_id") < 5), nprobe)
      .select(col("vec_id").as("qid"), col("cell"))
    val cand = cells.join(broadcast(qcells), Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"))
    val scored = cand.join(codes, Seq("vec_id"))
      .join(broadcast(dtable), Seq("qid", "m", "code"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("pdist")).as("adc_score"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("adc_score").asc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
  }

  /** DuckDB CTE suffix of the IVF-PQ composition (expects [[pqCteSql]]
    * + [[pqAdcCteSql]] in scope; coarse CTEs are `i`-prefixed to avoid
    * colliding with the PQ chain's `cents`): coarse assignment → probe
    * cells → cell-bounded candidates → ADC lookups → `ipqranked`.
    */
  private val ivfpqCteSql: String =
    s"""icents AS (SELECT vec_id AS cid, embedding FROM embeddings
                   WHERE vec_id % 50 = 0),
       iadot AS (
         SELECT e.vec_id, c.cid,
                (SELECT sum(CAST(floor(e.embedding[CAST(i AS INT)] * 1e6 + 0.5e0) AS BIGINT)
                            * CAST(floor(c.embedding[CAST(i AS INT)] * 1e6 + 0.5e0) AS BIGINT))
                 FROM generate_series(1, 64) g(i)) AS dot
         FROM embeddings e CROSS JOIN icents c),
       iassign AS (
         SELECT vec_id, cid AS cell FROM (
           SELECT vec_id, cid,
                  row_number() OVER (PARTITION BY vec_id
                    ORDER BY dot DESC, cid) AS rn
           FROM iadot) x WHERE rn = 1),
       pcells AS (
         SELECT vec_id AS qid, cid AS cell FROM (
           SELECT vec_id, cid,
                  row_number() OVER (PARTITION BY vec_id
                    ORDER BY dot DESC, cid) AS rn
           FROM iadot WHERE vec_id < 5) x WHERE rn <= 3),
       cand AS (
         SELECT p.qid, a.vec_id FROM pcells p
         JOIN iassign a ON a.cell = p.cell
         WHERE a.vec_id <> p.qid),
       ipqadc AS (
         SELECT c.qid, c.vec_id, CAST(sum(d.pdist) AS BIGINT) AS adc_score
         FROM cand c
         JOIN pqcodes k ON k.vec_id = c.vec_id
         JOIN dtable d ON d.qid = c.qid AND d.m = k.m AND d.code = k.code
         GROUP BY 1, 2),
       ipqranked AS (
         SELECT qid, vec_id, adc_score,
                row_number() OVER (PARTITION BY qid
                  ORDER BY adc_score ASC, vec_id ASC) AS rank
         FROM ipqadc)"""

  /** ADC-ranked neighbors (qid, rank, vec_id, adc_score) for the
    * vec_id < 5 query set — shared by `sim_pq_adc_topk` and
    * `sim_pq_recall`.
    */
  private def pqAdcRanked(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val subs = graft.Caches.registerTransient(pqSubspaces(s, d)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val codes = pqAssign(subs)
    val dtable = subs.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("m"), col("xs").as("qs"))
      .join(broadcast(pqCentroids(subs)), Seq("m"))
      .select(col("qid"), col("m"), col("cell").as("code"),
        (call_function("dotl", col("cs"), col("cs")) -
          lit(2L) * call_function("dotl", col("qs"), col("cs")))
          .as("pdist"))
    val scored = codes.join(broadcast(dtable), Seq("m", "code"))
      .filter(col("vec_id") =!= col("qid"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("pdist")).as("adc_score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid"))
      .orderBy(col("adc_score").asc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
  }

  /** DuckDB CTE suffix of the ADC search (expects [[pqCteSql]] in
    * scope): per-query distance tables → summed lookups → `pqranked`.
    */
  private val pqAdcCteSql: String =
    """dtable AS (
         SELECT v.vec_id AS qid, v.m, c.cell AS code,
           (SELECT sum(c.cs[CAST(i AS INT)] * c.cs[CAST(i AS INT)])
            FROM generate_series(1, 16) g(i))
           - 2 * (SELECT sum(v.xs[CAST(i AS INT)] * c.cs[CAST(i AS INT)])
                  FROM generate_series(1, 16) g(i)) AS pdist
         FROM subs v JOIN cents c USING (m)
         WHERE v.vec_id < 5),
       pqcodes AS (SELECT vec_id, m, cell AS code FROM best),
       pqadc AS (
         SELECT d.qid, k.vec_id,
                CAST(sum(d.pdist) AS BIGINT) AS adc_score
         FROM pqcodes k JOIN dtable d USING (m, code)
         WHERE k.vec_id <> d.qid
         GROUP BY 1, 2),
       pqranked AS (
         SELECT qid, vec_id, adc_score,
                row_number() OVER (PARTITION BY qid
                  ORDER BY adc_score ASC, vec_id ASC) AS rank
         FROM pqadc)"""

  /** Quantized 4×16-dim subspace relation (vec_id, m, xs) — the shared
    * head of the PQ family (`sim_pq_encode`, `sim_pq_adc_topk`).
    */
  private def pqSubspaces(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), Embeddings.quantArray(col("embedding")).as("xq"))
      .select(col("vec_id"), posexplode(
          array((0 until 4).map(m => slice(col("xq"), m * 16 + 1, 16)): _*))
        .as(Seq("m", "xs")))

  /** Deterministic sub-codebooks: the 1-in-50 seed vectors' subvectors. */
  private def pqCentroids(
      subs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    subs.filter(col("vec_id") % 50 === 0)
      .select(col("m"), col("vec_id").as("cell"), col("xs").as("cs"))

  /** Nearest sub-codeword per (vector, subspace): (vec_id, m, code). */
  private def pqAssign(
      subs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    subs.join(broadcast(pqCentroids(subs)), Seq("m"))
      .withColumn("score",
        call_function("dotl", col("cs"), col("cs")) -
          lit(2L) * call_function("dotl", col("xs"), col("cs")))
      .groupBy(col("vec_id"), col("m"))
      .agg(min(struct(col("score"), col("cell"))).as("b"))
      .select(col("vec_id"), col("m"), col("b.cell").as("code"))

  /** DuckDB CTE chain of the PQ family: quantize → subspace split →
    * seed codebooks → per-subspace nearest-codeword (`best`).
    */
  private val pqCteSql: String = {
    val subSelects = (0 until 4).map(m =>
      s"""SELECT vec_id, $m AS m,
            list_slice(xq, ${m * 16 + 1}, ${(m + 1) * 16}) AS xs FROM q""")
      .mkString("\n                UNION ALL ")
    s"""q AS (
          SELECT vec_id,
                 list_transform(embedding,
                   x -> CAST(floor(x * 1e6 + 0.5e0) AS BIGINT)) AS xq
          FROM embeddings),
        subs AS (
            $subSelects),
        cents AS (SELECT m, vec_id AS cell, xs AS cs FROM subs
                  WHERE vec_id % 50 = 0),
        scored AS (
          SELECT v.vec_id, v.m, c.cell,
            (SELECT sum(c.cs[CAST(i AS INT)] * c.cs[CAST(i AS INT)])
             FROM generate_series(1, 16) g(i))
            - 2 * (SELECT sum(v.xs[CAST(i AS INT)] * c.cs[CAST(i AS INT)])
                   FROM generate_series(1, 16) g(i)) AS score
          FROM subs v JOIN cents c USING (m)),
        best AS (
          SELECT vec_id, m, cell FROM (
            SELECT vec_id, m, cell,
                   row_number() OVER (PARTITION BY vec_id, m
                                      ORDER BY score, cell) AS rn
            FROM scored) r WHERE rn = 1)"""
  }
}
