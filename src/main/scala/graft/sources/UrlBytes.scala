package graft.sources

import java.io.{ByteArrayOutputStream, InputStream}

/** Shared fetch for the out-of-band sources (S6/S7/S8): resolve a location
  * that is either a filesystem path or a `java.net.URL` (http(s), file,
  * …) to bytes.
  *
  * These feeds are DIMENSION-sized (yield curves, linker tables — KBs to
  * MBs), so the fetch is a bounded driver-side read and the parsed result
  * is a broadcastable dimension frame; a 100 TB fact table never moves
  * through here. (For bulk data the pattern is different: land the file in
  * distributed storage once, then `spark.read` it.) In this sandbox there
  * is no egress, so tests exercise the identical code path via `file://`
  * URLs — the protocol handler is the only difference.
  */
object UrlBytes {

  def open(urlOrPath: String): InputStream =
    if (urlOrPath.contains("://")) new java.net.URL(urlOrPath).openStream()
    else new java.io.FileInputStream(urlOrPath)

  def readAll(in: InputStream): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](64 * 1024)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close()
    out.toByteArray
  }

  def fetch(urlOrPath: String): Array[Byte] = readAll(open(urlOrPath))
}
