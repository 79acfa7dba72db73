package graft.operators

import graft.SparkSpec

/** The parsed-manifest cache: entries(dir, v) parses a committed
  * manifest ONCE per (file identity) — repeated metadata queries on
  * the same version are pure cache hits — while staying
  * self-invalidating: a new commit parses its own manifest, and a
  * RE-CREATED table directory (same path, same version id, different
  * file) misses on identity and re-parses, never serving stale
  * entries.
  */
class ManifestCacheSpec extends SparkSpec {

  private def freshDir(tag: String): String = {
    val base = s"/tmp/graft-test/mancache-$tag"
    graft.Scratch.clear(base)
    s"$base/t"
  }

  private def commitOne(dir: String, n: Int): Int =
    SnapshotLog.commitEntries(dir, (0 until n).map(i =>
      SnapshotLog.FileEntry(s"$dir/f$i.parquet", "D", s"g=$i",
        Map.empty, seq = 1L, rows = 10L)))

  test("same version parses once; a new version parses once more") {
    val dir = freshDir("hit")
    commitOne(dir, 5)
    SnapshotLog.resetEntryCache()
    val p0 = SnapshotLog.entryParses.get()
    val e1 = SnapshotLog.entries(dir, 1)
    assert(e1.size == 5)
    assert(SnapshotLog.entryParses.get() == p0 + 1)
    // second + third read of the SAME version: zero parses
    assert(SnapshotLog.entries(dir, 1).size == 5)
    assert(SnapshotLog.entries(dir, 1) eq e1,
      "a cache hit must return the memoized object")
    assert(SnapshotLog.entryParses.get() == p0 + 1,
      "re-reading a cached version must not re-parse")
    // a new commit parses its own manifest exactly once
    SnapshotLog.commitEntries(dir,
      SnapshotLog.entries(dir, 1) :+ SnapshotLog.FileEntry(
        s"$dir/f9.parquet", "D", "g=9", Map.empty, seq = 2L, rows = 1L))
    assert(SnapshotLog.entries(dir, 2).size == 6)
    assert(SnapshotLog.entries(dir, 2).size == 6)
    assert(SnapshotLog.entryParses.get() == p0 + 2)
  }

  test("a re-created table at the same path never serves stale entries") {
    val dir = freshDir("stale")
    commitOne(dir, 3)
    assert(SnapshotLog.entries(dir, 1).size == 3)
    // wipe and rebuild the SAME path with DIFFERENT content at v1
    graft.Scratch.clear(s"/tmp/graft-test/mancache-stale")
    commitOne(dir, 7)
    assert(SnapshotLog.entries(dir, 1).size == 7,
      "the cache must miss on the rebuilt manifest's new identity")
  }

  test("an expired manifest still fails loudly") {
    val dir = freshDir("expired")
    commitOne(dir, 2)
    SnapshotLog.commitEntries(dir, SnapshotLog.entries(dir, 1))
    SnapshotLog.entries(dir, 1) // warm the cache
    SnapshotLog.expire(dir, keepFrom = 2)
    val e = intercept[IllegalArgumentException](
      SnapshotLog.entries(dir, 1))
    assert(e.getMessage.contains("no snapshot v1"),
      s"expired version must refuse, got: ${e.getMessage}")
  }
}
