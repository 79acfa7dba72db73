package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The BPE merge round, pinned on crafted vocabularies — especially the
  * LEFTMOST-GREEDY non-overlap rule, the part a naive "merge every
  * matching pair" formulation gets wrong.
  */
class BpeSpec extends SparkSpec {

  private def tf(rows: (String, Long)*) = {
    import spark.implicits._
    rows.toDF("word", "freq")
  }

  test("greedy rule: 'aaaa' merges positions 1 and 3, never 2") {
    val sym0 = QBpe.initialSymbols(tf("aaaa" -> 1L))
    val (merged, winner) = QBpe.mergeRound(sym0, 1)
    val w = winner.collect()(0)
    assert((w.getString(1), w.getString(2)) == (("a", "a")))
    assert(w.getLong(3) == 3L, "pair count counts ALL adjacencies (3), selection is separate")
    val out = merged.orderBy(col("i")).select(col("s")).collect().map(_.getString(0))
    assert(out.toSeq == Seq("aa", "aa", "</w>"),
      s"greedy application produced ${out.toSeq}")
  }

  test("merge winner is frequency-weighted and tie-broken lexicographically") {
    // 'ab' x3 vs 'cd' x3: tie on count, (a,b) < (c,d) lexicographically
    val sym0 = QBpe.initialSymbols(tf("ab" -> 3L, "cd" -> 3L))
    val (_, winner) = QBpe.mergeRound(sym0, 1)
    val w = winner.collect()(0)
    assert((w.getString(1), w.getString(2)) == (("a", "b")))
  }

  test("merged symbol participates in later rounds (round-2 pair spans the merge)") {
    // 'abc' x5: round 1 merges (a,b); round 2's top pair is (ab, c)
    var sym = QBpe.initialSymbols(tf("abc" -> 5L))
    val (m1, w1) = QBpe.mergeRound(sym, 1)
    assert({ val w = w1.collect()(0); (w.getString(1), w.getString(2)) } == (("a", "b")))
    val (_, w2) = QBpe.mergeRound(m1, 2)
    val w = w2.collect()(0)
    assert((w.getString(1), w.getString(2)) == (("ab", "c")),
      s"round 2 should pair the merged symbol: got (${w.getString(1)}, ${w.getString(2)})")
  }
}
