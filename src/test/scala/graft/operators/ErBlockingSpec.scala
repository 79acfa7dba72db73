package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-8 ask: the q-gram blocking cap must keep candidate generation
  * LINEAR on hot-gram name distributions (every real name corpus has a
  * "Corp"/"Inc " gram shared by nearly all rows) while preserving every
  * true match that shares at least one informative gram.
  */
class ErBlockingSpec extends SparkSpec {
  import spark.implicits._

  private val n = 200
  // every name shares the hot "Corporation-" stem (9+ universal grams);
  // the 4-digit tail is the informative part
  private def clean = (0 until n)
    .map(i => (i.toLong, f"Corporation-$i%04d")).toDF("id", "ename")
  private def dirty = (0 until n)
    .map(i => (i + 10000L, i.toLong, f"Corporation-$i%04dx"))
    .toDF("d_id", "true_id", "dname")

  test("uncapped hot-gram blocking is the quadratic cross product") {
    val un = ErBlocking.grams(dirty, "dname")
      .join(ErBlocking.grams(clean, "ename"), Seq("gram"))
      .select($"d_id", $"id").distinct().count()
    assert(un == n.toLong * n,
      s"fixture must be degenerate without the cap (got $un of ${n * n})")
  }

  test("capped blocking stays linear and keeps every true pair") {
    val capped = ErBlocking.candidates(
        ErBlocking.grams(dirty, "dname"),
        ErBlocking.grams(clean, "ename"),
        maxBucket = ErBlocking.DefaultMaxGramBucket)
      .select($"d_id", $"true_id", $"id").distinct()
    val total = capped.count()
    // linear bound: each dirty row may meet a bounded neighbor set via
    // its informative grams (digit grams with occupancy <= cap), never
    // the whole corpus. 64 pairs/row is generous headroom vs the ~n^2
    // uncapped count asserted above.
    assert(total <= n.toLong * 64,
      s"candidates not linear under cap: $total for $n rows")
    assert(total < n.toLong * n / 4, "cap failed to break the quadratic")
    // recall: every true pair still generated (tail grams are shared
    // between a name and its 1-edit corruption)
    val hits = capped.filter($"id" === $"true_id").count()
    assert(hits == n.toLong, s"lost true pairs: $hits of $n")
  }

  test("names shorter than q emit no grams (oracle empty-series parity)") {
    // Spark's sequence(1, n) flips to a DESCENDING default step for
    // n < 1 — unclamped, a 2-char name would emit bogus position-0
    // grams while the DuckDB oracle's generate_series(1, n) is empty.
    val short = Seq((1L, "ab"), (2L, "abc"), (3L, ""), (4L, "abcd"))
      .toDF("id", "ename")
    val g = ErBlocking.grams(short, "ename").select($"id", $"gram").collect()
    assert(g.toSet == Set(org.apache.spark.sql.Row(4L, "abcd")),
      s"short names must emit no grams: ${g.mkString(",")}")
  }

  test("stop list fires exactly on the hot grams, never the informative ones") {
    val stops = ErBlocking.stopGrams(
        ErBlocking.grams(clean, "ename"), ErBlocking.DefaultMaxGramBucket)
      .as[String].collect().toSet
    assert(stops.contains("Corp") && stops.contains("tion"))
    // a mid-tail digit gram is informative (occupancy ~ n/1000 here)
    assert(!stops.exists(_.forall(c => c.isDigit)),
      s"digit grams must survive: $stops")
  }
}
