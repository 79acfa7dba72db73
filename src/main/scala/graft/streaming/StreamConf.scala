package graft.streaming

import org.apache.spark.sql.SparkSession

/** Pins `spark.sql.shuffle.partitions` for the duration of a streaming
  * query run.
  *
  * Stateful streaming operators create one state-store instance per
  * shuffle partition per stateful operator (a stream-stream join keeps
  * FOUR per partition), and every instance pays its own checkpoint commit
  * each micro-batch — so the partition count must be sized to the stateful
  * KEY volume, not the CPU count. The bench corpus has ~2k distinct join
  * keys: at 32 partitions the stream-stream join spent 3-5x longer
  * committing state stores than joining (measured 9-16 s at 32 partitions
  * vs ~3 s at 4 on identical data). Default 8 balances commit overhead
  * against per-partition state size; raise
  * `spark.graft.streaming.statePartitions` on a real cluster where key
  * volume, not commit overhead, dominates (state partitions CANNOT change
  * across restarts of the same checkpoint, so size for the target scale
  * up front).
  *
  * The conf is read when the query starts, so wrapping the start/await
  * pair suffices; the previous value is always restored.
  */
object StreamConf {
  def withStatePartitions[A](spark: SparkSession)(body: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key,
      spark.conf.get("spark.graft.streaming.statePartitions", "8"))
    try body finally spark.conf.set(key, prev)
  }
}
