package graft.operators

import graft.SparkSpec

/** `TIMESTAMP AS OF` (s48). Claims pinned:
  *  - commit stamps are STRICTLY increasing even when many commits land
  *    inside one clock tick (the `max(now, prev+1)` rule);
  *  - resolveTimestamp picks the newest snapshot at or before t, and
  *    each commit's own stamp resolves exactly that commit;
  *  - a timestamp before the oldest retained snapshot fails loudly —
  *    after expiry, old stamps don't silently serve newer data.
  */
class TimestampTravelSpec extends SparkSpec {

  test("strictly increasing stamps; boundary resolution; expiry is loud") {
    val dir = "/tmp/graft-test/ts-travel"
    graft.Scratch.clear(dir)
    // five commits as fast as the CAS allows — far faster than the
    // clock ticks, so the +1 rule must carry the monotonicity
    (1 to 5).foreach(i => SnapshotLog.commit(dir, Seq(s"f$i.parquet")))
    val stamps = (1 to 5).map(v => SnapshotLog.tsOf(dir, v).get)
    assert(stamps == stamps.sorted && stamps.distinct.size == 5,
      s"stamps not strictly increasing: $stamps")

    (1 to 5).foreach { v =>
      assert(SnapshotLog.resolveTimestamp(dir, stamps(v - 1)) == v)
    }
    // between two stamps → the earlier snapshot
    assert(SnapshotLog.resolveTimestamp(dir, stamps(2) - 1) == 2)
    // far future → latest
    assert(SnapshotLog.resolveTimestamp(dir, Long.MaxValue) == 5)
    // before the first commit → loud
    intercept[IllegalArgumentException] {
      SnapshotLog.resolveTimestamp(dir, stamps.head - 1)
    }
    // after expiry, a stamp pointing below the retention floor is loud
    SnapshotLog.expire(dir, keepFrom = 3)
    intercept[IllegalArgumentException] {
      SnapshotLog.resolveTimestamp(dir, stamps(0))
    }
    assert(SnapshotLog.resolveTimestamp(dir, stamps(3)) == 4)
  }
}
