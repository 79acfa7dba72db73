package graft.queries

import graft.Tables
import graft.llmdata.TextOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** BPE vocabulary TRAINING (Sennrich et al. 2016) as a relational
  * program: start from the word-frequency table (characters + a `</w>`
  * terminal per word), then per merge round — count adjacent symbol
  * pairs weighted by word frequency, pick the argmax pair
  * (deterministic tie-break), and apply the merge with the standard
  * LEFTMOST-GREEDY non-overlap rule. The greedy rule is the part
  * naive formulations get wrong ("a a a" merges once, not twice);
  * here it is relational — runs of consecutive match positions via
  * gaps-and-islands, keep the odd ranks — so the DuckDB oracle replays
  * it with the same windows instead of trusting a fold.
  *
  * Scale shape: every round operates on the VOCABULARY relation (words
  * × symbol positions), never the corpus — the corpus is touched once
  * for the frequency table, which is the classic BPE-training layout
  * (the corpus can be 100 TB; the vocab table is MBs). Winners stay
  * in-plan (1-row broadcast), no driver-side collect; each round's
  * symbol table is persisted so round r+1 doesn't replay rounds 1..r.
  */
object QBpe extends Registry {

  private val Rounds = 4

  /** (word, freq) → exploded (word, freq, i, s) symbol-position rows:
    * characters plus the `</w>` terminal.
    */
  private[queries] def initialSymbols(tf: DataFrame): DataFrame =
    tf.select(col("word"), col("freq"),
        posexplode(concat(split(col("word"), ""), array(lit("</w>")))))
      .select(col("word"), col("freq"), (col("pos") + 1).as("i"),
        col("col").as("s"))

  /** One merge round: (symbols, round index) → (merged symbols, the
    * 1-row winner frame (round, left, right, pair_freq)).
    */
  private[queries] def mergeRound(sym: DataFrame, round: Int): (DataFrame, DataFrame) = {
    val adj = sym.as("a").join(sym.as("b"),
        col("a.word") === col("b.word") && col("b.i") === col("a.i") + 1)
      .select(col("a.word").as("word"), col("a.freq").as("freq"),
        col("a.i").as("i"), col("a.s").as("sa"), col("b.s").as("sb"))
    val winner = adj.groupBy(col("sa"), col("sb"))
      .agg(sum(col("freq")).as("pair_freq"))
      .orderBy(col("pair_freq").desc, col("sa").asc, col("sb").asc)
      .limit(1)
      .select(lit(round).as("round"), col("sa").as("left"),
        col("sb").as("right"), col("pair_freq"))
    val matches = adj.join(broadcast(winner),
        col("sa") === col("left") && col("sb") === col("right"))
      .select(col("word"), col("i"))
    // leftmost-greedy: runs of consecutive match positions → odd ranks
    val wRun = Window.partitionBy(col("word")).orderBy(col("i"))
    val applied = matches
      .withColumn("grp", col("i") - row_number().over(wRun))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("word"), col("grp")).orderBy(col("i"))))
      .filter(col("rn") % 2 === 1)
      .select(col("word"), col("i"))
    val nxt = sym.select(col("word"), (col("i") - 1).as("i"),
      col("s").as("s_next"))
    val merged = sym
      .join(applied.withColumn("app", lit(true)), Seq("word", "i"), "left")
      .join(applied.select(col("word"), (col("i") + 1).as("i"),
        lit(true).as("absorbed")), Seq("word", "i"), "left")
      .filter(col("absorbed").isNull)
      .join(nxt, Seq("word", "i"), "left")
      .select(col("word"), col("freq"), col("i"),
        when(col("app"), concat(col("s"), col("s_next")))
          .otherwise(col("s")).as("s"))
      .withColumn("i", row_number().over(wRun))
    (merged, winner)
  }

  /** (merge table, final symbol table) — built ONCE per (session, dir)
    * and memoized: `tx_bpe_train` and `tx_bpe_vocab` are two views of
    * the same training run. Round symbol tables go through
    * lineage-TRUNCATING barriers (each round references the prior
    * table ~5x — adjacency self-join, rebuild joins — so un-truncated
    * lineage grows 5^r and the round-4 plan alone exhausts the driver
    * heap); winners stay lazy (one tiny aggregate each over a
    * barriered table, re-run only when the union materializes).
    */
  private def bpeArtifacts(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    var finalSym: DataFrame = null
    val winners = graft.Caches.memo(s, s"bpe_winners:$d") {
      val tf = Tables.documents(s, d)
        .select(explode(TextOps.tokens(col("text"))).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      var sym = graft.Caches.barrier(initialSymbols(tf))
      val ws = (1 to Rounds).map { r =>
        val (merged, winner) = mergeRound(sym, r)
        sym = graft.Caches.barrier(merged)
        winner
      }
      finalSym = sym
      ws.reduce(_.unionByName(_))
    }
    // populated together with the winners memo (same call, same order);
    // a hit on winners with sym absent is impossible short of a failed
    // build, in which case the rebuild repopulates both
    val symOut = graft.Caches.memo(s, s"bpe_sym:$d")(finalSym)
    (winners, symOut)
  }

  def qs: Seq[Q] = Seq(

    // The learned merge table — BPE training's entire output (a
    // tokenizer is this list applied in order). One row per round:
    // (round, left, right, pair_freq at selection time).
    Q("tx_bpe_train",
      (s, d) => bpeArtifacts(s, d)._1,
      Some(bpeOracle)),

    // The post-training symbol inventory: every distinct symbol in the
    // final vocabulary with its frequency-weighted occurrence count —
    // the "vocab file" next to the merge table, and a stronger gate
    // than the merges alone (a wrong greedy application changes symbol
    // counts even when the chosen merges happen to agree).
    // ENCODE the corpus with the trained vocabulary — the apply half of
    // the tokenizer: every document's words join the final word→symbols
    // table (BPE application per word is deterministic given the merge
    // list, so training's final symbol table IS the encoder — a
    // broadcast dictionary at any corpus scale), yielding per-doc BPE
    // token counts next to whitespace word counts. The compression
    // ratio n_bpe_tokens/n_words is the statistic a tokenizer ships.
    Q("tx_bpe_encode",
      (s, d) => {
        val perWord = bpeArtifacts(s, d)._2
          .groupBy(col("word")).agg(count(lit(1)).as("n_syms"))
        Tables.documents(s, d)
          .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("word"))
          .join(broadcast(perWord), Seq("word"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_words"),
            sum(col("n_syms")).as("n_bpe_tokens"))
      },
      Some(s"""WITH ${bpeRoundCtes(Rounds)},
            perword AS (SELECT word, CAST(count(*) AS BIGINT) AS n_syms
                        FROM sym$Rounds GROUP BY 1),
            occ AS (SELECT doc_id, unnest(string_split(
                      trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '))
                      AS word
                    FROM documents)
            SELECT o.doc_id, CAST(count(*) AS BIGINT) AS n_words,
                   CAST(sum(p.n_syms) AS BIGINT) AS n_bpe_tokens
            FROM occ o JOIN perword p USING (word)
            GROUP BY 1""")),

    Q("tx_bpe_vocab",
      (s, d) => bpeArtifacts(s, d)._2
        .groupBy(col("s"))
        .agg(sum(col("freq")).as("n_occ"))
        .withColumnRenamed("s", "symbol"),
      Some(s"""WITH ${bpeRoundCtes(Rounds)}
            SELECT s AS symbol, CAST(sum(freq) AS BIGINT) AS n_occ
            FROM sym$Rounds GROUP BY 1"""))
  )

  /** CTE chain `sym0 … sym$rounds` + `win1 … win$rounds`, generated per
    * round — the oracle replays every round with the same relational
    * greedy-application windows as the Spark side.
    */
  private def bpeRoundCtes(rounds: Int): String = {
    val toksSql = "string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')"
    val head =
      s"""tf AS (SELECT word, CAST(count(*) AS BIGINT) AS freq
                 FROM (SELECT unnest($toksSql) AS word FROM documents) u
                 GROUP BY 1),
          sym0 AS MATERIALIZED (
            SELECT word, freq, CAST(i AS BIGINT) AS i, s FROM (
              SELECT word, freq,
                     generate_subscripts(list_append(string_split(word, ''), '</w>'), 1) AS i,
                     unnest(list_append(string_split(word, ''), '</w>')) AS s
              FROM tf) x)"""
    val rounds_ = (1 to rounds).map { r =>
      val p = r - 1
      s"""adj$r AS MATERIALIZED (
            SELECT a.word, a.freq, a.i, a.s AS sa, b.s AS sb
            FROM sym$p a JOIN sym$p b ON b.word = a.word AND b.i = a.i + 1),
          win$r AS MATERIALIZED (
            SELECT $r AS round, sa AS "left", sb AS "right",
                   CAST(sum(freq) AS BIGINT) AS pair_freq
            FROM adj$r GROUP BY sa, sb
            ORDER BY pair_freq DESC, sa ASC, sb ASC LIMIT 1),
          m$r AS (
            SELECT a.word, a.i FROM adj$r a CROSS JOIN win$r w
            WHERE a.sa = w."left" AND a.sb = w."right"),
          app$r AS MATERIALIZED (
            SELECT word, i FROM (
              SELECT word, i,
                     row_number() OVER (PARTITION BY word, grp ORDER BY i) AS rn
              FROM (SELECT word, i,
                      i - row_number() OVER (PARTITION BY word ORDER BY i) AS grp
                    FROM m$r) g) x
            WHERE rn % 2 = 1),
          sym$r AS MATERIALIZED (
            SELECT word, freq,
                   row_number() OVER (PARTITION BY word ORDER BY i) AS i, s
            FROM (
              SELECT s.word, s.freq, s.i,
                     CASE WHEN a1.i IS NOT NULL THEN s.s || n.s ELSE s.s END AS s
              FROM sym$p s
              LEFT JOIN app$r a1 ON a1.word = s.word AND a1.i = s.i
              LEFT JOIN app$r a2 ON a2.word = s.word AND a2.i = s.i - 1
              LEFT JOIN sym$p n ON n.word = s.word AND n.i = s.i + 1
              WHERE a2.i IS NULL) y)"""
    }.mkString(",\n          ")
    s"$head,\n          $rounds_"
  }

  private def bpeOracle: String = {
    val sel = (1 to Rounds).map(r =>
      s"""SELECT round, "left", "right", pair_freq FROM win$r""")
      .mkString("\n            UNION ALL ")
    s"""WITH ${bpeRoundCtes(Rounds)}
        $sel"""
  }
}
