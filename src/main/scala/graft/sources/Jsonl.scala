package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSONL (newline-delimited JSON) source — the de-facto interchange
  * format of LLM training corpora (one document object per line,
  * gzip-compressed shards). No reference analogue (the reference's
  * world is WRDS/parquet/CSV); this is a training-data extension like
  * S11.
  *
  * Two scale decisions baked in:
  *  - the schema is EXPLICIT, never inferred: `spark.read.json` without
  *    a schema runs a full inference pass over the data first — at
  *    100 TB that is a second scan of the corpus before the first real
  *    one. Parsing also prunes to the requested fields, so a 2-column
  *    projection never materializes a 40-field document object.
  *  - corrupt lines are CAPTURED, not fatal: web-scale JSONL always has
  *    torn lines (truncated uploads, mid-record splits). PERMISSIVE
  *    mode + an explicit corrupt-record column quarantines them for
  *    audit while the healthy 99.999% proceeds. (Gzip shards are
  *    per-file splits — one executor per shard; that is the trade the
  *    format itself makes. Prefer zstd/raw for re-splittable inputs.)
  */
object Jsonl {

  val CorruptCol = "_corrupt_record"

  /** read JSONL (optionally .gz) with an explicit data schema; corrupt
    * lines land in [[CorruptCol]] with every data field null. Spark
    * caveat: an audit query over the corrupt column must also reference
    * at least one data column (or cache the parse first) —
    * corrupt-only projections off a raw JSON scan are disallowed.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** healthy rows only, corrupt column dropped — the common read. */
  def readClean(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val df = read(spark, path, schema)
    df.filter(df.col(CorruptCol).isNull).drop(CorruptCol)
  }
}
