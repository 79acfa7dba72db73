package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering key for multi-dimensional data layout.
  *
  * A range-partitioned, sorted write on `zValue(dims)` places rows that
  * are close in EVERY dimension into the same files, so each file's
  * parquet footer min/max covers a small box of the key space and a
  * multi-dimensional box predicate prunes most files — the layout trick
  * behind Delta/Iceberg `OPTIMIZE ZORDER BY`, here as a plain column
  * expression any `repartitionByRange(...).sortWithinPartitions(...)`
  * write can use. Linear layouts cluster only their leading sort key;
  * a predicate on the second dimension then touches every file.
  *
  * Pure bit arithmetic on the input columns (shift/and/or) — stays
  * inside whole-stage codegen, no UDF. Values must fit in `bits` bits
  * (caller normalizes or buckets first); 2 dims × 16 bits ⇒ a 32-bit
  * key, up to 4 dims × 15 bits fit a positive long.
  */
object ZOrder {

  def zValue(dims: Seq[Column], bits: Int = 16): Column = {
    require(dims.nonEmpty && dims.size * bits <= 62,
      s"${dims.size} dims x $bits bits must fit a positive long")
    val terms = for {
      i <- 0 until bits
      (dim, j) <- dims.zipWithIndex
    } yield shiftleft(
      shiftright(dim.cast("long"), i).bitwiseAND(lit(1L)),
      i * dims.size + j)
    terms.reduce(_ + _)
  }
}
