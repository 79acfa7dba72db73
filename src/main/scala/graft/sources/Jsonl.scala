package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** JSONL (newline-delimited JSON) source — the de-facto interchange
  * format of LLM training corpora (one document object per line,
  * gzip-compressed shards). No reference analogue (the reference's
  * world is WRDS/parquet/CSV); this is a training-data extension like
  * S11.
  *
  * Formulated as a `text` scan + `from_json`, not the raw json
  * datasource, for three scale reasons:
  *  - the schema is EXPLICIT, never inferred: `spark.read.json` without
  *    a schema runs a full inference pass over the data first — at
  *    100 TB that is a second scan of the corpus before the first real
  *    one. `from_json` prunes the parse to the requested fields
  *    (OptimizeJsonExprs), so a 2-column projection never materializes
  *    a 40-field document object.
  *  - corrupt lines are CAPTURED, not fatal: web-scale JSONL always has
  *    torn lines (truncated uploads, mid-record splits). PERMISSIVE
  *    parsing + an explicit corrupt-record column quarantines them for
  *    audit while the healthy 99.999% proceeds.
  *  - counts and corrupt-only audits just work: the raw json datasource
  *    refuses any query whose pruned scan references only the internal
  *    corrupt column (QUERY_ONLY_CORRUPT_RECORD_COLUMN — `count()` after
  *    dropping data columns dies), while the text scan always reads the
  *    line itself. (Gzip shards are per-file splits — one executor per
  *    shard; that is the trade the format itself makes. Prefer zstd/raw
  *    for re-splittable inputs.)
  */
object Jsonl {

  val CorruptCol = "_corrupt_record"

  /** read JSONL (optionally .gz) with an explicit data schema; corrupt
    * lines land in [[CorruptCol]] with every data field null. Blank
    * lines are skipped (mirroring the json datasource, which never
    * surfaces them as records).
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val full = schema.add(CorruptCol, StringType)
    spark.read.text(path)
      // \S (any non-whitespace char) rather than trim(): trim strips only
      // ASCII spaces, so a tabs-only line would slip past a length check,
      // parse to a NULL struct, and surface as a phantom all-null "healthy"
      // row — the same failure mode the bare-"null" test pins, via whitespace
      .filter(col("value").rlike("\\S"))
      .select(from_json(col("value"), full,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> CorruptCol)).as("j"))
      .select(col("j.*"))
  }

  /** healthy rows only, corrupt column dropped — the common read. */
  def readClean(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val df = read(spark, path, schema)
    df.filter(df.col(CorruptCol).isNull).drop(CorruptCol)
  }
}
