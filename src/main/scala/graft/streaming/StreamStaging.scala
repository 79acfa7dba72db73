package graft.streaming

/** Shared staging for pointing a streaming file source at a SINGLE file:
  * Spark's file stream source monitors a directory, so a lone parquet file
  * is staged into a per-path temp dir via symlink (no copy).
  *
  * The dir is keyed on an md5 digest of the absolute path — a 32-bit
  * `String.hashCode` could collide across two distinct source paths, and
  * the first-created symlink would win, silently streaming the wrong file.
  */
object StreamStaging {

  /** Returns a directory suitable for `readStream`: the path itself when
    * it is already a directory, else a symlink-staged temp dir.
    */
  def dirFor(path: String): String = {
    val f = new java.io.File(path)
    if (!f.isFile) path
    else {
      // digest/mkdir convention lives in graft.Scratch (same
      // "graft_stream_<md5>" name this produced before the extraction)
      val d = java.nio.file.Paths.get(
        graft.Scratch.dirFor("stream", f.getAbsolutePath))
      val link = d.resolve(f.getName)
      if (!java.nio.file.Files.exists(link))
        java.nio.file.Files.createSymbolicLink(link, f.toPath.toAbsolutePath)
      d.toString
    }
  }
}
