package graft.operators

/** Misra–Gries frequency summary — the k-bounded deterministic
  * heavy-hitter sketch (Misra & Gries 1982; merge rule from Agarwal et
  * al., "Mergeable Summaries", PODS 2012). The guarantee this library
  * builds on: after sketching a stream of n keys with k counters, every
  * key's stored count is within n/(k+1) of its true count, so any key
  * with true count > n/(k+1) is PRESENT in the sketch. The two-pass
  * heavy-hitters query (`sk_mg_heavyhitters`) therefore never shuffles
  * the full key domain: pass 1 ships one ≤k-entry summary per
  * partition, pass 2 recounts only the ≤k surviving candidates exactly.
  *
  * Unlike the CMS (`sk_cms_heavyhitters`), which needs the heavy keys
  * NAMED up front to probe them, MG DISCOVERS the heavy keys — the two
  * sketches answer opposite halves of the frequency question.
  *
  * (No reference counterpart — an LLM-data-scale extension; the
  * reference is a financial pipeline with no sketch layer.)
  */
object MisraGries {

  /** One pass over a partition's keys with k counters. On a miss with a
    * full table, every counter is decremented and zeros evicted (the
    * arriving key is absorbed by the same decrement) — each such event
    * consumes k+1 count units, so at most n/(k+1) events occur and the
    * amortized cost is O(1) per key. Returns the surviving counters
    * plus the partition's row count (so the caller gets n in the same
    * pass).
    */
  def sketch(keys: Iterator[String], k: Int): (Long, Map[String, Long]) = {
    require(k > 0, "k must be positive")
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    var n = 0L
    while (keys.hasNext) {
      val key = keys.next()
      n += 1L
      m.get(key) match {
        case Some(c) => m.update(key, c + 1L)
        case None =>
          if (m.size < k) m.update(key, 1L)
          else {
            // snapshot the entries: mutating a HashMap mid-iteration is
            // undefined; ≤ n/(k+1) such events keep this off the hot path
            for ((kk, c) <- m.toArray)
              if (c == 1L) m.remove(kk) else m.update(kk, c - 1L)
          }
      }
    }
    (n, m.toMap)
  }

  /** Mergeable-summaries merge: sum counters pointwise, then — if more
    * than k survive — subtract the (k+1)-th largest value from every
    * counter and evict the non-positive. Preserves the additive error
    * bound (n_a + n_b)/(k+1), so partition sketches fold in ANY order
    * without losing the superset-of-heavy guarantee.
    */
  def merge(a: Map[String, Long], b: Map[String, Long], k: Int)
      : Map[String, Long] = {
    val m = scala.collection.mutable.HashMap.empty[String, Long] ++ a
    b.foreach { case (kk, c) => m.update(kk, m.getOrElse(kk, 0L) + c) }
    if (m.size <= k) m.toMap
    else {
      val vk1 = m.values.toArray.sortWith(_ > _).apply(k)
      m.iterator.collect {
        case (kk, c) if c > vk1 => (kk, c - vk1)
      }.toMap
    }
  }
}
