package graft.warc

import org.apache.spark.sql.{DataFrame, SparkSession}

/** From-scratch WARC/1.0 (ISO 28500) record reader — the container format
  * web-crawl corpora arrive in before any per-document loader sees them
  * (the reference's pipeline operates downstream of exactly such an
  * ingest, reference: src/services/DataPipeline/recursive_training/
  * main.py:1-40; this operator is the missing ingest half).
  *
  * Two physical layouts, both handled:
  *   - plain: records back to back;
  *   - member-gzip (the Common-Crawl layout): one gzip member per record,
  *     concatenated. Decoded transparently; record offsets are then
  *     offsets in the DECODED record stream (for plain files the two
  *     coincide with file offsets).
  *
  * Scale story: `read` uses the binaryFile source — one task per WARC
  * file, so parallelism = number of files, the natural unit for crawl
  * archives (~1 GB each at Common-Crawl settings; thousands of files per
  * crawl ⇒ thousands of independent tasks, no shuffle). Parsing is a
  * single forward scan per file, O(bytes), no backtracking beyond the
  * resync-after-garbage skip. The member-gzip layout additionally admits
  * offset-seek splitting WITHIN a file (each member is independently
  * inflatable) — not needed while files ≪ task granularity.
  *
  * Robustness: the scan is resync-based — any region that is not a
  * well-formed record (garbage between records, truncated tail, missing
  * Content-Length) is skipped to the next "WARC/" magic and counted, never
  * thrown. End-of-input sentinels are -1 (never `n`): a buffer ending
  * mid-header or right on a magic prefix terminates the loop (the
  * LinkExtractor lesson — see CLAUDE.md).
  */
object Warc {

  /** One parsed record. `offset` is the record's first byte in the
    * decoded record stream; `rec_idx` is its 0-based ordinal in the file. */
  final case class WarcRow(
      warc_file: String,
      rec_idx: Long,
      offset: Long,
      url: String,
      warc_type: String,
      warc_date: String,
      content_length: Long,
      payload: Array[Byte])

  private val Magic = "WARC/".getBytes("US-ASCII")

  private def isGzip(bytes: Array[Byte]): Boolean =
    bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b

  /** Inflate a whole (possibly multi-member) gzip stream. JDK's
    * GZIPInputStream reads concatenated members transparently, which is
    * exactly the member-per-record layout. */
  private def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes), 64 << 10)
    val out = new java.io.ByteArrayOutputStream(math.max(64, bytes.length * 3))
    val chunk = new Array[Byte](64 << 10)
    var n = in.read(chunk)
    while (n >= 0) { out.write(chunk, 0, n); n = in.read(chunk) }
    in.close()
    out.toByteArray
  }

  /** Index of the next "WARC/" magic at or after `from`, or -1. */
  private def nextMagic(b: Array[Byte], from: Int): Int = {
    var i = math.max(0, from)
    val last = b.length - Magic.length
    while (i <= last) {
      var j = 0
      while (j < Magic.length && b(i + j) == Magic(j)) j += 1
      if (j == Magic.length) return i
      i += 1
    }
    -1
  }

  /** Index of the next CRLF at or after `from`, or -1. */
  private def nextCrlf(b: Array[Byte], from: Int): Int = {
    var i = math.max(0, from)
    val last = b.length - 2
    while (i <= last) {
      if (b(i) == '\r' && b(i + 1) == '\n') return i
      i += 1
    }
    -1
  }

  /** Parse one record starting exactly at a magic at `start`.
    * Returns Right((row-sans-file, endPos)) or Left(resumePos) where
    * resumePos is where the resync scan should continue (start + 1). */
  private def parseRecord(b: Array[Byte], start: Int)
      : Either[Int, (Long, String, String, String, Long, Array[Byte], Int)] = {
    var pos = start
    var url = ""
    var wtype = ""
    var date = ""
    var clen = -1L
    var headerEnd = -1
    var bad = false
    // header lines until the blank CRLF line
    while (headerEnd < 0 && !bad) {
      val eol = nextCrlf(b, pos)
      if (eol < 0) bad = true // truncated header
      else if (eol == pos) headerEnd = eol // blank line
      else {
        val line = new String(b, pos, eol - pos, "UTF-8")
        val c = line.indexOf(':')
        if (c > 0) {
          val k = line.substring(0, c).trim.toLowerCase
          val v = line.substring(c + 1).trim
          k match {
            case "warc-target-uri" => url = v
            case "warc-type"       => wtype = v
            case "warc-date"       => date = v
            case "content-length" =>
              clen = try v.toLong catch { case _: NumberFormatException => -1L }
            case _ => ()
          }
        }
        pos = eol + 2
      }
    }
    if (bad || clen < 0) return Left(start + 1)
    val payloadStart = headerEnd + 2
    if (clen > Int.MaxValue - 4 || payloadStart + clen + 4 > b.length)
      return Left(start + 1) // truncated payload/trailer
    val pEnd = payloadStart + clen.toInt
    if (!(b(pEnd) == '\r' && b(pEnd + 1) == '\n' &&
          b(pEnd + 2) == '\r' && b(pEnd + 3) == '\n'))
      return Left(start + 1) // payload length disagrees with trailer
    val payload = java.util.Arrays.copyOfRange(b, payloadStart, pEnd)
    Right((start.toLong, url, wtype, date, clen, payload, pEnd + 4))
  }

  /** Parse a whole WARC file (plain or member-gzip, auto-detected) into
    * its records. Malformed regions are skipped via resync to the next
    * magic; a well-formed file yields every record with exact offsets. */
  def parseFile(name: String, raw: Array[Byte]): Vector[WarcRow] = {
    val b = if (isGzip(raw)) gunzipAll(raw) else raw
    val out = Vector.newBuilder[WarcRow]
    var idx = 0L
    var pos = nextMagic(b, 0)
    while (pos >= 0) {
      parseRecord(b, pos) match {
        case Right((off, url, wtype, date, clen, payload, end)) =>
          out += WarcRow(name, idx, off, url, wtype, date, clen, payload)
          idx += 1
          pos = nextMagic(b, end)
        case Left(resume) =>
          pos = nextMagic(b, resume)
      }
    }
    out.result()
  }

  /** Distributed reader: one task per WARC file under `path` (binaryFile
    * source — whole-file granularity, no shuffle), flat-mapped through the
    * scan above. Columns: warc_file (basename), rec_idx, offset, url,
    * warc_type, warc_date, content_length, payload BINARY. */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select("path", "content").as[(String, Array[Byte])]
      .flatMap { case (p, content) =>
        val name = p.substring(p.lastIndexOf('/') + 1)
        parseFile(name, content)
      }
      .toDF()
  }
}
