package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join, the Spark-native replacement for the reference's
  * `pd.merge_asof(direction="backward", by=..., on=...)` calls
  * (`stage1/stage1_pipeline.py:739-759` amount outstanding,
  * `stage1/stage1_pipeline.py:884-902` ratings).
  *
  * Design (scale-first): rather than a range join + `row_number` (which
  * explodes into an O(n·m) range-intersection per key), we union the two
  * sides into one event stream, shuffle ONCE by the `by` keys, and forward
  * -fill the right side's payload with
  * `last(payload, ignoreNulls).over(unboundedPreceding..0)`. Cost is a
  * single shuffle + sort of |left|+|right| rows — the optimal distributed
  * plan for an as-of join without pre-bucketed inputs. Whole-row semantics
  * are preserved by packing the right payload into ONE struct (per-column
  * fills could mix rows when the right side has nulls).
  */
object AsOfJoin {

  /** @param left      rows to enrich
    * @param right     keyed event table
    * @param by        equality keys present on both sides
    * @param leftOn    ordering column on `left` (e.g. trade date)
    * @param rightOn   ordering column on `right` (e.g. rating date)
    * @param payload   columns of `right` to carry (must not collide with left)
    * @param rightTieBreak extra `right` ordering columns — among events with
    *                  equal `rightOn`, the row that sorts LAST wins
    * @param strict    if true, match only events strictly before `leftOn`
    *                  (merge_asof `allow_exact_matches=False`)
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      by: Seq[String],
      leftOn: String,
      rightOn: String,
      payload: Seq[String],
      rightTieBreak: Seq[String] = Nil,
      strict: Boolean = false): DataFrame = {
    val t = "__asof_t"
    val side = "__asof_side"   // right=0 sorts before left=1 at equal t (inclusive match)
    val pay = "__asof_payload"
    val leftCols = left.columns.toSeq

    // left rows sort AFTER right rows at the same timestamp unless strict.
    val (rightSide, leftSide) = if (strict) (1, 0) else (0, 1)

    val l = left
      .withColumn(t, col(leftOn))
      .withColumn(side, lit(leftSide))
      .withColumn(pay, lit(null).cast(structType(right, payload)))
    val r = right
      .select((by.map(col) ++ Seq(col(rightOn).as(t))
        ++ rightTieBreak.map(col)
        :+ struct(payload.map(col): _*).as(pay)): _*)
      .withColumn(side, lit(rightSide))
    // align schemas: left's own columns are null on the right side
    val rAligned = leftCols.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val unioned = l.select((leftCols.map(col) ++ Seq(col(t), col(side), col(pay))
        ++ rightTieBreak.map(c => lit(null).cast(right.schema(c).dataType).as(c))): _*)
      .unionByName(rAligned.select((leftCols.map(col) ++ Seq(col(t), col(side), col(pay))
        ++ rightTieBreak.map(col)): _*))

    val ord: Seq[Column] = col(t).asc +: col(side).asc +: rightTieBreak.map(col(_).asc_nulls_first)
    val w = Window.partitionBy(by.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = unioned.withColumn(pay, last(col(pay), ignoreNulls = true).over(w))
    filled
      .filter(col(side) === leftSide)
      .select((leftCols.map(col) ++ payload.map(p => col(s"$pay.$p").as(p))): _*)
  }

  private def structType(df: DataFrame, cols: Seq[String]) = {
    org.apache.spark.sql.types.StructType(cols.map(c => df.schema(c)))
  }
}
