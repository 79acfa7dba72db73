package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The rename+widen mapping pair: upgrade∘downgrade is the identity on
  * in-range data, the narrowing guard raises on overflow instead of
  * wrapping, and both mappings stay pure projections (zero exchanges —
  * the property that makes evolution free at table scale).
  */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private val renames = Map("qty" -> "quantity")
  private val widen = Map("quantity" -> "bigint")
  private val narrow =
    Map("quantity" -> (("int", Int.MinValue.toLong, Int.MaxValue.toLong)))

  test("upgrade then downgrade is the identity on in-range rows") {
    val v1 = Seq((1L, 5), (2L, -7), (3L, Int.MaxValue)).toDF("id", "qty")
    val up = SchemaEvolution.upgradeReader(v1, renames, widen)
    assert(up.schema("quantity").dataType.typeName == "long")
    val back = SchemaEvolution.downgradeReader(up, renames, narrow)
    assert(back.schema("qty").dataType.typeName == "integer")
    assert(back.as[(Long, Int)].collect().toSet ==
      Set((1L, 5), (2L, -7), (3L, Int.MaxValue)))
  }

  test("narrowing guard raises on overflow, never wraps") {
    val canonical = Seq((1L, 5L), (2L, Int.MaxValue.toLong + 1))
      .toDF("id", "quantity")
    val down = SchemaEvolution.downgradeReader(canonical, renames, narrow)
    val e = intercept[Exception] { down.collect() }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("downgrade overflow")),
      s"wrong failure: ${e.getMessage}")
    // nulls pass through as nulls, no raise
    val withNull = Seq((1L, Some(5L)), (2L, None)).toDF("id", "quantity")
    val ok = SchemaEvolution.downgradeReader(withNull, renames, narrow)
      .collect().map(r => if (r.isNullAt(1)) None else Some(r.getInt(1)))
    assert(ok.toSet == Set(Some(5), None))
  }

  test("both mappings are pure projections — zero exchanges") {
    val v1 = Seq((1L, 5)).toDF("id", "qty")
    val up = SchemaEvolution.upgradeReader(v1, renames, widen)
    val c = graft.Plans.planCounts(
      SchemaEvolution.downgradeReader(up, renames, narrow))
    assert(c.shuffles == 0 && c.broadcasts == 0,
      s"evolution mappings shuffled: $c")
  }
}
