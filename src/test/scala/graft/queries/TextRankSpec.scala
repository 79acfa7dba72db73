package graft.queries

import graft.SparkSpec

/** Driver-side reference checks for the two trickiest in-row text
  * computations of the round:
  *
  *  - `tx_gopher_rules`'s top-gram count is a max-run-length fold over
  *    the SORTED hash array — pinned against a plain driver-side
  *    mode-count over the same (injection-included) token streams.
  *  - `tx_bm25_topk`'s integer milli-unit scores use the piecewise
  *    log2milli idf, whose max error vs true log2 is 0.086 bits per
  *    call; with ≤2 log calls per term, tf-weight ≤ 2.2 and ≤3 terms,
  *    adjacent-rank inversions are only possible when true double-BM25
  *    scores sit within ~2.5 score units of each other — the returned
  *    ranking must agree with the double reference outside that band.
  *
  * Both run the REGISTERED query fns against a temp documents.parquet,
  * so the assertions cover the exact production expressions.
  */
class TextRankSpec extends SparkSpec {

  private def writeDocs(docs: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_textrank").toString
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private val vocab = Seq("table", "scan", "join", "window", "spark",
    "hash", "batch", "stream", "customer", "value", "row", "fast")

  private def randomDocs(n: Int, seed: Long): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    (0L until n.toLong).map { id =>
      val len = 20 + rnd.nextInt(60)
      (id, (1 to len).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
  }

  test("gopher top-gram counts equal a driver-side mode count") {
    val docs = randomDocs(40, seed = 42)
    val dir = writeDocs(docs)
    val rows = graft.SparkEntry.queries("tx_gopher_rules")(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    for ((id, text) <- docs) {
      // replicate the query's graded injection before counting:
      // (doc_id % 5) * floor(n_tokens / 4) repeats of one 'spam' token
      val toks0 = text.split(" ").toSeq
      val k = (id % 5) * (toks0.size / 4)
      val toks = toks0 ++ Seq.fill(k.toInt)("spam")
      def grams(n: Int) = toks.sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq
      def top(n: Int) =
        if (toks.size < n) 0L
        else grams(n).groupBy(identity).values.map(_.size).max.toLong
      def dist(n: Int) = grams(n).distinct.size.toLong
      val r = rows(id)
      assert(r.getLong(2) == top(2), s"doc $id top2: ${r.getLong(2)} vs ${top(2)}")
      assert(r.getLong(4) == top(3), s"doc $id top3")
      assert(r.getLong(6) == top(4), s"doc $id top4")
      assert(r.getLong(8) == dist(5), s"doc $id d5")
      assert(r.getLong(10) == dist(10), s"doc $id d10")
    }
  }

  test("integer BM25 ranking agrees with double BM25 outside the error band") {
    val docs = randomDocs(120, seed = 7)
    val dir = writeDocs(docs)
    val queries = Map(
      1L -> Seq("spark", "window", "join"),
      2L -> Seq("hash", "table", "scan"),
      3L -> Seq("stream", "batch", "customer"))
    // double-precision reference BM25 (k1=1.2, b=0.75, idf=log2((N+1)/(df+.5)))
    val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val n = docs.size.toDouble
    val avgdl = toks.values.map(_.size).sum / n
    def dscore(qid: Long, id: Long): Double = queries(qid).map { term =>
      val tf = toks(id).count(_ == term).toDouble
      if (tf == 0) 0.0
      else {
        val df = docs.count { case (i, _) => toks(i).contains(term) }.toDouble
        val idf = math.log((n + 1) / (df + 0.5)) / math.log(2)
        idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * toks(id).size / avgdl))
      }
    }.sum
    val out = graft.SparkEntry.queries("tx_bm25_topk")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1)
    graft.Caches.clearTransient()
    for ((qid, rows) <- out) {
      val ranked = rows.sortBy(_._2).map(_._3)
      // adjacent ranks may only invert the double ordering inside the
      // integer approximation's error band (~2.5 score units)
      for (Seq(a, b) <- ranked.sliding(2).map(_.toSeq)
           if ranked.size >= 2) {
        assert(dscore(qid, a) >= dscore(qid, b) - 2.5,
          s"query $qid: rank order $a before $b contradicts double BM25 " +
            s"(${dscore(qid, a)} vs ${dscore(qid, b)})")
      }
    }
  }
}
