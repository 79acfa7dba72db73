package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Native bottomk aggregate — the contracts that make it a sketch
  * primitive: order/partitioning invariance (heap fold == global
  * sort-take), value identity with the typed-Aggregator KMV
  * construction, the two-phase ObjectHashAggregate plan, and null/empty
  * semantics.
  */
class BottomKSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("bottomk == sort-take, invariant under partitioning; nulls skipped") {
    import spark.implicits._
    graft.GraftExtensions.ensure(spark)
    val vals: Seq[java.lang.Long] =
      Seq[java.lang.Long](5L, 1L, null, 9L, 3L, 3L, 7L, 2L, 8L, null, 0L)
    val df = vals.toDF("v")
    val want = vals.filter(_ != null).map(_.longValue).sorted.take(4)
    for (parts <- Seq(1, 7)) {
      val got = df.repartition(parts)
        .agg(expr("bottomk(v, 4)")).head.getSeq[Long](0)
      assert(got == want, s"parts=$parts: $got != $want")
    }
    // empty input -> empty array, not null
    val empty = df.filter(col("v") > 100)
      .agg(expr("bottomk(v, 4)")).head.getSeq[Long](0)
    assert(empty.isEmpty)
  }

  test("native sketch == typed-Aggregator sketch on the corpus") {
    graft.GraftExtensions.ensure(spark)
    val hv = QSketch.kmvHashes(
      Tables.documents(spark, sf)).persist()
    val native = hv.groupBy(col("side"))
      .agg(expr("bottomk(h, 256)").as("hs"))
      .select(col("side"), posexplode(col("hs")))
      .select(col("side"), (col("pos") + 1).as("rk"), col("col").as("h"))
    val viaAggregator = QSketch.kmvSketchFrom(hv, 256)
      .select(col("side"), col("rk").cast("long").as("rk"), col("h"))
    val nat = native.select(col("side"), col("rk").cast("long"), col("h"))
    assert(nat.exceptAll(viaAggregator).count() == 0 &&
      viaAggregator.exceptAll(nat).count() == 0)
    hv.unpersist()
  }

  test("narrower integrals implicitly widen; uncastable input fails analysis") {
    graft.GraftExtensions.ensure(spark)
    import spark.implicits._
    // INT column: pre-fix this analyzed fine and then threw
    // ClassCastException inside update() at execution — now the
    // ImplicitCastInputTypes contract widens it to LONG
    val got = Seq(5, 1, 9, 3).toDF("v")
      .agg(expr("bottomk(v, 2)")).head.getSeq[Long](0)
    assert(got == Seq(1L, 3L))
    // an array can never cast to LONG: analysis-time failure, like the
    // other native expressions
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq(Seq(1L)).toDF("v").agg(expr("bottomk(v, 2)")).head
    }
  }

  test("plans as two-phase ObjectHashAggregate with partial bottomk") {
    graft.GraftExtensions.ensure(spark)
    import spark.implicits._
    val plan = (1L to 100L).toDF("v").groupBy(col("v") % 3)
      .agg(expr("bottomk(v, 5)"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_bottomk"), plan)
  }
}
