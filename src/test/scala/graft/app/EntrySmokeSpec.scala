package graft.app

import graft.SparkSpec

/** Driver-contract smoke: entry() on sf0.001 must return rows > 0, and
  * every registered query must produce a non-degenerate plan there.
  */
class EntrySmokeSpec extends SparkSpec {
  test("entry() returns rows on sf0.001") {
    val n = graft.SparkEntry.entry(spark).count()
    assert(n > 0, s"entry produced $n rows")
  }

  test("query and oracle key sets line up") {
    val qs = graft.SparkEntry.queries.keySet
    val os = graft.SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs))
    assert(qs.size >= 66)
  }
}
