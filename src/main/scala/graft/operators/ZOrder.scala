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
  * inside whole-stage codegen, no UDF. Values must fit in `bits` bits:
  * callers with arbitrary-range dimensions normalize through
  * [[bucketed]] first (what a real OPTIMIZE ZORDER does — it clusters
  * on rank/range buckets, not raw values), and [[zValue]] REFUSES
  * out-of-range input at runtime rather than silently dropping high
  * bits — a raw key past the bit budget would alias distant values
  * onto the same z-prefix and quietly collapse the multi-dimensional
  * clustering the layout exists for. 2 dims × 16 bits ⇒ a 32-bit key,
  * up to 4 dims × 15 bits fit a positive long.
  */
object ZOrder {

  def zValue(dims: Seq[Column], bits: Int = 16): Column = {
    require(dims.nonEmpty && dims.size * bits <= 62,
      s"${dims.size} dims x $bits bits must fit a positive long")
    // one guard per DIM (not per bit term): negative input would
    // arithmetic-shift to sign bits, oversized input would truncate —
    // both silent clustering collapses. Fail the job instead.
    val lim = 1L << bits
    val checked = dims.map { dim =>
      val d = dim.cast("long")
      when(d.isNull || d < 0L || d >= lim, raise_error(concat(
          lit(s"zValue: dim out of [0, $lim) for bits=$bits, got "),
          d.cast("string"), lit(" — bucket/normalize the dim first"))))
        .otherwise(d)
    }
    val terms = for {
      i <- 0 until bits
      (dim, j) <- checked.zipWithIndex
    } yield shiftleft(
      shiftright(dim, i).bitwiseAND(lit(1L)),
      i * dims.size + j)
    terms.reduce(_ + _)
  }

  /** Normalize an arbitrary-range LONG dimension into the z-curve's bit
    * budget: [lo, hi] maps affinely onto [0, 2^bits). Order-preserving,
    * so range predicates on the raw column still correspond to ranges
    * of the bucketed dim; adjacent raw values may share a bucket (the
    * curve clusters at bucket granularity — exactly the Delta/Iceberg
    * OPTIMIZE behavior). Bounds come from the caller's stats pass
    * (table min/max — metadata-cheap next to the rewrite itself).
    */
  def bucketed(dimName: String, lo: Long, hi: Long, bits: Int = 16): Column = {
    require(hi >= lo, s"bucketed: empty domain [$lo, $hi]")
    // hi - lo + 1 overflows Long once the domain spans more than half
    // the Long range (lo near MinValue, hi > 0): the wrap would slip
    // past the require and alias buckets. Fail fast via exact math.
    val width =
      try Math.subtractExact(hi, lo)
      catch { case _: ArithmeticException =>
        throw new IllegalArgumentException(
          s"bucketed: domain [$lo, $hi] wider than Long.MaxValue — " +
            "pre-scale the dim (e.g. div) before bucketing") }
    require(width < Long.MaxValue,
      s"bucketed: domain [$lo, $hi] spans 2^63 values — " +
        "pre-scale the dim before bucketing")
    val span = width + 1
    // (dim - lo) * 2^bits stays inside a long for spans up to 2^(62-bits)
    // — divide first past that (sub-bucket precision is moot once buckets
    // are already wider than 2^bits values)
    if (span <= (1L << (62 - bits)))
      expr(s"(($dimName - $lo) * ${1L << bits}) div $span")
    else {
      // overflow-safe ceil(span / 2^bits): span + 2^bits - 1 would wrap
      // for spans near Long.MaxValue
      val b = 1L << bits
      val ceilDiv = span / b + (if (span % b != 0) 1L else 0L)
      expr(s"($dimName - $lo) div $ceilDiv")
    }
  }
}
