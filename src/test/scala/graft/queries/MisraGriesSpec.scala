package graft.queries

import graft.{SparkEntry, SparkSpec}
import graft.operators.MisraGries
import org.apache.spark.sql.functions._

/** Misra–Gries heavy hitters (sk_mg_heavyhitters) — the guarantee the
  * two-pass query builds on, exercised adversarially:
  *
  *  1. Error bound: after sketching n keys with k counters, every key's
  *     stored count is within n/(k+1) of truth — so the sketch CONTAINS
  *     every key with true count > n/(k+1), for any input order.
  *  2. Mergeability: the bound survives arbitrary partition splits and
  *     arbitrary merge orders (Agarwal et al. merge rule).
  *  3. End-to-end: the shipped query equals the plain GROUP BY + HAVING
  *     formulation it replaces.
  */
class MisraGriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Deterministic adversarial stream: 3 heavy keys woven through a
    * long once-seen tail, in an order that maximizes decrement events
    * (tail keys arrive between heavy repeats).
    */
  private def stream(n: Int): Seq[String] =
    (0 until n).map { i =>
      if (i % 2 == 0) s"H${i % 4 / 2}" // H0/H1, each n/4 times
      else s"tail-$i"
    }

  test("sketch contains every key above n/(k+1), worst-case order, any k") {
    for (k <- Seq(4, 8, 16)) {
      val s = stream(9000)
      val (n, m) = MisraGries.sketch(s.iterator, k)
      assert(n == 9000L)
      assert(m.size <= k, s"k=$k sketch overflowed: ${m.size}")
      val truth = s.groupBy(identity).map { case (kk, v) => kk -> v.size.toLong }
      val heavy = truth.filter { case (_, c) => c * (k + 1) > n }.keySet
      assert(heavy.nonEmpty, "fixture must have heavy keys")
      assert(heavy.subsetOf(m.keySet),
        s"k=$k lost heavy keys: ${heavy -- m.keySet}")
      // the error bound itself, every key
      truth.foreach { case (kk, c) =>
        val est = m.getOrElse(kk, 0L)
        assert(est <= c && c - est <= n / (k + 1),
          s"k=$k key $kk: true $c, stored $est violates n/(k+1)=${n / (k + 1)}")
      }
    }
  }

  test("merged partition sketches keep the superset-of-heavy guarantee") {
    val k = 8
    val s = stream(9000)
    // three hostile splits: contiguous, round-robin, all-heavy-last
    val splits = Seq(
      s.grouped(3000).toSeq,
      Seq(s.zipWithIndex.filter(_._2 % 2 == 0).map(_._1),
        s.zipWithIndex.filter(_._2 % 2 == 1).map(_._1)),
      Seq(s.filterNot(_.startsWith("H")), s.filter(_.startsWith("H"))))
    val truth = s.groupBy(identity).map { case (kk, v) => kk -> v.size.toLong }
    val heavy = truth.filter { case (_, c) => c * (k + 1) > s.size }.keySet
    for (parts <- splits) {
      val sketches = parts.map(p => MisraGries.sketch(p.iterator, k)._2)
      // both fold directions — merge must be order-insensitive for the bound
      val fwd = sketches.foldLeft(Map.empty[String, Long])(
        MisraGries.merge(_, _, k))
      val bwd = sketches.reverse.foldLeft(Map.empty[String, Long])(
        MisraGries.merge(_, _, k))
      for (merged <- Seq(fwd, bwd)) {
        assert(merged.size <= k)
        assert(heavy.subsetOf(merged.keySet),
          s"merge lost heavy keys: ${heavy -- merged.keySet}")
      }
    }
  }

  test("native mg aggregate: library-fold equality, superset under " +
      "partitioning, two-phase plan") {
    graft.GraftExtensions.ensure(spark)
    import spark.implicits._
    val s = stream(9000)
    val k = 8
    val truth = s.groupBy(identity).map { case (kk, v) => kk -> v.size.toLong }
    val heavy = truth.filter { case (_, c) => c * (k + 1) > s.size }.keySet
    // hostile partitionings: the superset-of-heavy guarantee must hold
    // whatever task split Spark picks
    for (parts <- Seq(1, 3, 17)) {
      val row = s.toDF("k").repartition(parts)
        .agg(expr(s"mg(k, $k)")).head.getStruct(0)
      assert(row.getLong(0) == 9000L)
      val entries = row.getSeq[org.apache.spark.sql.Row](1)
        .map(r => r.getString(0) -> r.getLong(1))
      assert(entries.size <= k, s"parts=$parts overflowed: ${entries.size}")
      assert(heavy.subsetOf(entries.map(_._1).toSet),
        s"parts=$parts lost heavy keys")
      // counts never exceed truth and honor the n/(k+1) band
      entries.foreach { case (kk, est) =>
        val c = truth(kk)
        assert(est <= c && c - est <= 9000L / (k + 1),
          s"parts=$parts key $kk: true $c stored $est")
      }
      // single partition == the library fold exactly (same algorithm,
      // no merge nondeterminism)
      if (parts == 1) {
        val (_, lib) = MisraGries.sketch(s.iterator, k)
        assert(entries.toMap == lib, "native single-task != library fold")
      }
    }
    // nulls skipped, n counts only non-null
    val withNulls = (s.map(Option(_)) ++ Seq(None, None)).toDF("k")
    assert(withNulls.agg(expr(s"mg(k, $k)")).head.getStruct(0)
      .getLong(0) == 9000L)
    // plan shape: two-phase ObjectHashAggregate with a partial_mg
    val plan = s.toDF("k").agg(expr(s"mg(k, $k)"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_mg"), plan)
  }

  test("grouped face: per-group heavy sets, partitioning-invariant, " +
      "candidates never collected") {
    graft.GraftExtensions.ensure(spark)
    val got = SparkEntry.queries("sk_mg_grouped")(spark, sf)
    // per-group truth: plain GROUP BY + HAVING
    val st = graft.Tables.lineitem(spark, sf)
      .select(col("l_returnflag").as("g"), QSketch.mgKeyCol.as("k"))
    val ng = st.groupBy(col("g")).agg(count(lit(1)).as("n"))
    val want = st.groupBy(col("g"), col("k")).agg(count(lit(1)).as("cnt"))
      .join(ng, Seq("g"))
      .filter(col("cnt") * (QSketch.MgK + 1) > col("n"))
      .select(col("g"), col("k"), col("cnt"))
    assert(got.exceptAll(want).count() == 0 &&
      want.exceptAll(got).count() == 0,
      "grouped two-pass MG != per-group GROUP BY + HAVING")
    // every return-flag group surfaces all 8 hot keys
    val perGroup = got.groupBy(col("g")).agg(count(lit(1)).as("nh"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perGroup.values.forall(_ == 8L), s"per-group heavy counts: $perGroup")
    // the plan is ONE grouped two-phase ObjectHashAggregate (partial_mg)
    // feeding a broadcast recount — no driver-side candidate list
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") &&
      plan.contains("partial_mg"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    graft.Caches.clearTransient()
  }

  test("two-pass query equals the GROUP BY + HAVING formulation") {
    val got = SparkEntry.queries("sk_mg_heavyhitters")(spark, sf)
    val st = graft.Tables.lineitem(spark, sf).select(
      when((col("l_orderkey") + col("l_linenumber")) % 2 === 0,
        concat(lit("hot-"), (col("l_orderkey") % 8).cast("string")))
        .otherwise(concat(lit("u-"), col("l_orderkey").cast("string"),
          lit("-"), col("l_linenumber").cast("string"))).as("k"))
    val n = st.count()
    val want = st.groupBy(col("k")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * (QSketch.MgK + 1) > lit(n))
    assert(got.count() == 8, "all 8 hot keys must be heavy")
    assert(got.exceptAll(want).count() == 0 &&
      want.exceptAll(got).count() == 0,
      "two-pass MG result must equal the full groupBy formulation")
    graft.Caches.clearTransient()
  }
}
