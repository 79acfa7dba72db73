package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a typed [[Aggregator]] — the aggregation-buffer
  * formulation of "top-k per group" (o3's window formulation sorts EVERY
  * row of a group; this one keeps k-bounded state per group and MERGES,
  * so partial aggregation combines map-side and the shuffle carries at
  * most k rows per (task, group) instead of the whole group). The win at
  * 100 TB: a hot group with 10^8 rows moves k rows per upstream task,
  * not 10^8, and no per-group sort ever materializes.
  *
  * Ordering: value DESC, then (ok, ln) ASC — a strict total order, so
  * the result row SET is deterministic and the fold is
  * association-order-invariant (spec-pinned against the window
  * formulation).
  */
final case class TopKIn(v: Long, ok: Long, ln: Int)
final case class TopKBuf(items: Seq[TopKIn])

class TopKByValue(k: Int) extends Aggregator[TopKIn, TopKBuf, TopKBuf] {
  require(k > 0, "k must be positive")

  private def better(a: TopKIn, b: TopKIn): Boolean =
    a.v > b.v || (a.v == b.v &&
      (a.ok < b.ok || (a.ok == b.ok && a.ln < b.ln)))

  private def norm(items: Seq[TopKIn]): Seq[TopKIn] =
    items.sortWith(better).take(k)

  override def zero: TopKBuf = TopKBuf(Nil)
  override def reduce(b: TopKBuf, a: TopKIn): TopKBuf =
    // O(k log k) on a ≤ k+1 element seq — the buffer never grows past k
    TopKBuf(norm(b.items :+ a))
  override def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf =
    TopKBuf(norm(b1.items ++ b2.items))
  override def finish(r: TopKBuf): TopKBuf = r
  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
}
