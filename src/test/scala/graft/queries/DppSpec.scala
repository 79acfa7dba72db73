package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** s24's claim is a PLAN property: the fact scan's partition filter is
  * fed at runtime by the dim side (dynamic partition pruning), so only
  * the partitions matching the dim's selective filter are read.
  */
class DppSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("dpp join plans a dynamicpruning partition filter on the fact scan") {
    val df = graft.SparkEntry.queries("s24_dpp_join")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamicpruning expression in the fact scan:\n${plan.take(2000)}")
    graft.Caches.clearTransient()
  }

  test("only dim-matching partitions are read (R pruned at runtime)") {
    graft.SparkEntry.queries("s24_dpp_join")(spark, sf).count()
    val dir = graft.Scratch.dirFor("s24_dpp", sf)
    // tag the file name on the FACT side pre-join (input_file_name is
    // single-source by contract)
    val fact = spark.read.parquet(s"$dir/fact")
      .withColumn("__f", input_file_name())
    val dim = spark.read.parquet(s"$dir/dim")
      .filter(col("tier") === "gold")
      .select(col("l_returnflag"))
    val joined = fact.join(dim, Seq("l_returnflag"))
    val filesRead = joined.select(col("__f")).distinct()
      .collect().map(_.getString(0)).toSet
      .filter(_.contains("/fact/"))
    val flagsRead = filesRead.flatMap(
      "l_returnflag=([^/]+)".r.findFirstMatchIn(_).map(_.group(1)))
    assert(flagsRead == Set("A", "N"),
      s"partitions read $flagsRead != dim-matching {A, N} — the 'R' " +
        "partition must be pruned by the runtime filter")
    graft.Caches.clearTransient()
  }
}
