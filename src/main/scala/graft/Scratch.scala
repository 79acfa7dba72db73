package graft

/** Deterministic per-(tag, input) scratch directories for sink-family
  * queries (S4 round-trip, S11 partitioned sink, J21 bucketed tables,
  * streaming admission staging). Keyed on an md5 digest of the input path
  * — NOT a fresh `createTempDirectory` per invocation, so bench reps /
  * verify / plan runs land on the same files and `overwrite` mode keeps
  * disk usage constant across reruns.
  */
object Scratch {

  def dirFor(tag: String, input: String): String = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(input.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val p = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft_${tag}_$digest")
    java.nio.file.Files.createDirectories(p)
    p.toString
  }

  /** Recursively delete a scratch subtree (streaming admission appends
    * per-micro-batch output, so reruns must start from an empty dir).
    */
  def clear(dir: String): Unit = {
    val root = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(root)) {
      import scala.jdk.CollectionConverters._
      // Files.walk holds open directory handles — close the stream, or
      // every call leaks an fd until GC
      val stream = java.nio.file.Files.walk(root)
      val paths =
        try stream.iterator().asScala.toSeq
        finally stream.close()
      paths.sortBy(-_.getNameCount)
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}
