package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, StructField, StructType}

/** `quant6arr` must equal the interpreted transform it replaced,
  * including null elements and negative / sub-micro values.
  */
class Quant6ArraySpec extends SparkSpec {

  test("native quantization equals the transform lambda") {
    graft.GraftExtensions.ensure(spark)
    val schema = StructType(Seq(
      StructField("v", ArrayType(FloatType, containsNull = true))))
    val rows = java.util.Arrays.asList(
      Row(Seq[java.lang.Float](1.0f, -1.0f, 0.0f, 0.1234567f, -0.9999995f)),
      Row(Seq[java.lang.Float](null, 2.5f)),
      Row(Seq[java.lang.Float]()),
      Row(Seq[java.lang.Float](Float.MinPositiveValue, -Float.MinPositiveValue)))
    val vecs = spark.createDataFrame(rows, schema)
    val composed = transform(col("v"),
      x => floor(x.cast("double") * 1e6 + 0.5).cast("long"))
    val diff = vecs
      .select(call_function("quant6arr", col("v")).as("native"),
        composed.as("ref"))
      .filter(col("native") =!= col("ref") ||
        size(col("native")) =!= size(col("ref")))
      .collect()
    assert(diff.isEmpty, s"quant6arr diverges: ${diff.toSeq}")
  }
}
