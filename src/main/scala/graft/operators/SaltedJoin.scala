package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join by key salting.
  *
  * When one join key dominates (a hot CUSIP, a null-ish default id), a
  * plain shuffle join lands the whole hot key on one task. Salting splits
  * each left key into `salt` sub-keys and replicates the right side once
  * per salt value, so the hot key spreads across `salt` tasks. AQE's
  * skew-join handles moderate skew automatically; explicit salting is the
  * tool when a single key exceeds what AQE can split (it cannot split a
  * single key group).
  *
  * Left side gets a deterministic salt from a stable hash of its row order
  * key; the right side is exploded over all salt values (×salt blowup on
  * the smaller side — choose sides accordingly).
  */
object SaltedJoin {

  def inner(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftSaltFrom: Column,
      salt: Int): DataFrame = {
    val salted = left.withColumn("__salt",
      pmod(xxhash64(leftSaltFrom), lit(salt)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
