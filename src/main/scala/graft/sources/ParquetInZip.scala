package graft.sources

import java.io.{ByteArrayInputStream, File, FileOutputStream}
import java.util.zip.ZipInputStream
import org.apache.spark.sql.{DataFrame, SparkSession}

/** S8 — parquet-inside-zip scan (the reference's
  * `load_parquet_from_zip_url`, `stage1/helper_functions.py:457-472`):
  * fetch a ZIP from a URL/path, extract the named member, read it as
  * parquet.
  *
  * The member is staged to a local temp file and handed to the normal
  * vectorized parquet reader — pushdown/pruning work as usual. Driver-
  * side staging is the right call for the reference's use (a linker
  * table, a few MB); for a BULK zip the pattern is stage-to-distributed-
  * storage once, which this same extraction loop does with the output
  * directed at the cluster filesystem.
  */
object ParquetInZip {

  /** list member names without extracting */
  def members(urlOrPath: String): Seq[String] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(UrlBytes.fetch(urlOrPath)))
    val names = Iterator.continually(zin.getNextEntry)
      .takeWhile(_ != null).map(_.getName).toList
    zin.close()
    names
  }

  /** read `memberName` inside the zip at `urlOrPath` as parquet */
  def read(spark: SparkSession, urlOrPath: String, memberName: String): DataFrame = {
    val zin = new ZipInputStream(new ByteArrayInputStream(UrlBytes.fetch(urlOrPath)))
    try {
      var entry = zin.getNextEntry
      while (entry != null && entry.getName != memberName)
        entry = zin.getNextEntry
      if (entry == null)
        throw new java.io.FileNotFoundException(
          s"member '$memberName' not found in $urlOrPath")
      val tmp = File.createTempFile("graft_zip_member_", ".parquet")
      tmp.deleteOnExit()
      val out = new FileOutputStream(tmp)
      try {
        val buf = new Array[Byte](64 * 1024)
        var n = zin.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = zin.read(buf) }
      } finally out.close()
      spark.read.parquet(tmp.getAbsolutePath)
    } finally zin.close()
  }
}
