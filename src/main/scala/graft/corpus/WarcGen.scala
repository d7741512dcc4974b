package graft.corpus

/** Deterministic WARC/1.0 file builder for the WARC-source harness
  * (ISO 28500; the container format the reference's crawl inputs arrive
  * in before its loaders see individual files,
  * reference: src/services/DataPipeline/recursive_training/main.py:1-40
  * operates downstream of exactly such an ingest).
  *
  * Record layout is FIXED (header order, one date literal, CRLF endings)
  * so every byte offset is a closed form the DuckDB oracle can replicate:
  *
  * {{{
  * WARC/1.0\r\n
  * WARC-Type: response\r\n
  * WARC-Target-URI: <url>\r\n
  * WARC-Date: 2026-01-01T00:00:00Z\r\n
  * Content-Length: <n>\r\n
  * \r\n
  * <payload (n bytes)>\r\n\r\n
  * }}}
  *
  * record length = FixedOverhead + len(url) + len(digits(n)) + n, with
  * FixedOverhead = 107 (header template + blank line + record trailer).
  */
object WarcGen {

  /** Byte overhead of one record beyond the url and the payload:
    * template text + CRLFs + the two-CRLF record separator. The oracle
    * splices this constant — do not change without regenerating gates. */
  val FixedOverhead: Int = 107

  val Date = "2026-01-01T00:00:00Z"

  def record(url: String, payload: Array[Byte]): Array[Byte] = {
    val head =
      s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $url\r\n" +
      s"WARC-Date: $Date\r\nContent-Length: ${payload.length}\r\n\r\n"
    val hb = head.getBytes("UTF-8")
    val out = new Array[Byte](hb.length + payload.length + 4)
    System.arraycopy(hb, 0, out, 0, hb.length)
    System.arraycopy(payload, 0, out, hb.length, payload.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** Plain (uncompressed) WARC file: records back to back. */
  def file(records: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(records.iterator.map(_.length).sum)
    records.foreach(out.write)
    out.toByteArray
  }

  /** Member-gzipped WARC file (the Common-Crawl layout: one gzip member
    * per record, so a reader can seek to a member and inflate one record
    * without touching the rest of the file). Deterministic: fixed mtime 0,
    * no name/comment fields, default deflate level. */
  def gzFile(records: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { r =>
      val gz = new java.util.zip.GZIPOutputStream(out)
      gz.write(r)
      gz.finish()
    }
    out.toByteArray
  }
}
