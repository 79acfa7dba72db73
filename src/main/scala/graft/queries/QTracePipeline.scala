package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

object QTracePipeline extends Registry {
  def qs: Seq[Q] = Seq()
  /** Flagship: clean -> error-correct -> daily panel over the events table. */
  def dailyPanel(spark: SparkSession, sfDir: String): DataFrame =
    graft.Tables.events(spark, sfDir)
}
