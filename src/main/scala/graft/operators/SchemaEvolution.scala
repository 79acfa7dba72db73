package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Schema-evolution WRITE path — the other half of the lake evolution
  * story next to the `mergeSchema` footer-union read (s23). A column
  * RENAME or type WIDEN never rewrites existing data files: files keep
  * the schema their producer version wrote, and the table carries a
  * per-version MAPPING that lifts old files to the canonical schema at
  * read time (the name-mapping resolution Iceberg/Delta perform from
  * their metadata; Spark expresses it as a pure projection, so it
  * composes with pushdown/pruning and costs one codegen'd cast per
  * column — zero backfill at any table size).
  *
  * [[upgradeReader]] lifts a v1-shaped frame to canonical (rename, then
  * widening cast). [[downgradeReader]] is the compatibility view for
  * READERS still pinned to the old schema: inverse renames and
  * narrowing casts guarded by `raise_error` — a canonical value that no
  * longer fits the old type fails loudly at the row, never wraps
  * silently (the failure mode that makes ad-hoc downcasts dangerous).
  */
object SchemaEvolution {

  /** canonical view of files written under an older schema version —
    * `renames` maps old name → canonical name, `widen` maps canonical
    * name → canonical type. Metadata-only: a projection over the scan.
    */
  def upgradeReader(df: DataFrame, renames: Map[String, String],
      widen: Map[String, String]): DataFrame = {
    val renamed = renames.foldLeft(df) { case (acc, (o, n)) =>
      acc.withColumnRenamed(o, n)
    }
    widen.foldLeft(renamed) { case (acc, (c, t)) =>
      acc.withColumn(c, col(c).cast(t))
    }
  }

  /** Lift a frame (files written under ANY historical schema version)
    * to the full canonical schema: apply whichever of `renames` its
    * columns still carry, cast every canonical column to its canonical
    * type, and null-fill columns added after the frame's writer version
    * (the add-column half of evolution). Output columns are exactly
    * `canonical` (plus `keep`, passed through untouched — reader-
    * internal metadata like row positions), in canonical order, so
    * lifted groups union structurally. Pure projection — composes with
    * pushdown and costs one codegen'd cast per column.
    */
  def upgradeTo(df: DataFrame,
      canonical: org.apache.spark.sql.types.StructType,
      renames: Map[String, String],
      keep: Seq[String] = Nil): DataFrame = {
    val applicable = renames.filter { case (o, n) =>
      df.columns.contains(o) && !df.columns.contains(n)
    }
    val renamed = upgradeReader(df, applicable, Map.empty)
    val cols = canonical.fields.toSeq.map { f =>
      if (renamed.columns.contains(f.name)) col(f.name).cast(f.dataType)
      else lit(null).cast(f.dataType).as(f.name)
    } ++ keep.map(col)
    renamed.select(cols: _*)
  }

  /** v1-compatibility view of the canonical relation: inverse renames +
    * narrowing casts, each guarded — out-of-range values raise, so an
    * old reader can trust the narrowed column exactly as far as it ever
    * could. `narrow` maps canonical name → (old type, lo, hi) bounds.
    */
  def downgradeReader(df: DataFrame, renames: Map[String, String],
      narrow: Map[String, (String, Long, Long)]): DataFrame = {
    val guarded = narrow.foldLeft(df) { case (acc, (c, (t, lo, hi))) =>
      acc.withColumn(c,
        when(col(c).isNull, lit(null).cast(t))
          .when(col(c) >= lo && col(c) <= hi, col(c).cast(t))
          .otherwise(raise_error(concat(
            lit(s"downgrade overflow: $c="), col(c).cast("string"),
            lit(s" outside [$lo, $hi] of $t")))
            .cast(t)))
    }
    renames.foldLeft(guarded) { case (acc, (o, n)) =>
      acc.withColumnRenamed(n, o)
    }
  }
}
