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
    * Returns Right((row-sans-file, endPos)) or Left((resumePos,
    * needMoreBytes)) where resumePos is where the resync scan should
    * continue (start + 1) and needMoreBytes distinguishes "ran off the end
    * of the buffer" (a longer buffer could succeed — the streaming reader
    * refills and retries) from structural malformation (no amount of
    * further input changes the verdict). [[parseFile]] ignores the flag
    * (it always holds the whole input). */
  private def parseRecord(b: Array[Byte], start: Int)
      : Either[(Int, Boolean), (Long, String, String, String, Long, Array[Byte], Int)] = {
    var pos = start
    var url = ""
    var wtype = ""
    var date = ""
    var clen = -1L
    var headerEnd = -1
    // header lines until the blank CRLF line
    while (headerEnd < 0) {
      val eol = nextCrlf(b, pos)
      if (eol < 0) return Left((start + 1, true)) // ran off the buffer end
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
    if (clen < 0) return Left((start + 1, false))
    val payloadStart = headerEnd + 2
    if (clen > Int.MaxValue - 4) return Left((start + 1, false))
    if (payloadStart + clen + 4 > b.length)
      return Left((start + 1, true)) // payload/trailer past the buffer end
    val pEnd = payloadStart + clen.toInt
    if (!(b(pEnd) == '\r' && b(pEnd + 1) == '\n' &&
          b(pEnd + 2) == '\r' && b(pEnd + 3) == '\n'))
      return Left((start + 1, false)) // payload length disagrees with trailer
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
        case Left((resume, _)) =>
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

  /** Incremental record iterator over a byte STREAM — identical rows to
    * [[parseFile]] (same `parseRecord` on the same bytes, same start+1
    * resync rule) but with **O(largest record) memory instead of
    * O(file)**: `read` holds each whole (decompressed) archive as one
    * array — ~1 GB gzip members inflate to several GB per task — while
    * this reader keeps a sliding window that is compacted after every
    * record and grown past a chunk only when a single record genuinely
    * spans further (`needMoreBytes` from the parser, never a guess).
    * Gzip (member or whole-stream) is detected from the first two bytes
    * and inflated incrementally by the same transparently-concatenating
    * GZIPInputStream. The caller owns closing `in0`. `chunkSize` is a test
    * seam (small chunks force every refill/compaction boundary). */
  def parseStream(name: String, in0: java.io.InputStream,
                  chunkSize: Int = 256 << 10): Iterator[WarcRow] = {
    require(chunkSize > 0, s"chunkSize $chunkSize") // 0 would spin forever
    val bin = new java.io.BufferedInputStream(in0, 64 << 10)
    bin.mark(2)
    val b0 = bin.read(); val b1 = bin.read()
    bin.reset()
    val in: java.io.InputStream =
      if (b0 == 0x1f && b1 == 0x8b) new java.util.zip.GZIPInputStream(bin, 64 << 10)
      else bin

    new Iterator[WarcRow] {
      private var buf = new Array[Byte](0) // live window
      private var base = 0L                // global (decoded) offset of buf(0)
      private var scanPos = 0              // next resync-scan index in buf
      private var eof = false
      private var idx = 0L
      private var row: WarcRow = _
      private var done = false

      /** Append up to `want` bytes. GEOMETRIC refills (callers pass
        * max(chunkSize, buf.length) when a record spans the window) keep
        * total copying O(record) amortized — fixed-size refills would
        * recopy the accumulated window per chunk, O(record²/chunk). */
      private def fill(want: Int): Boolean = {
        if (eof) return false
        val chunk = new Array[Byte](want)
        var got = 0
        var r = 0
        while (got < want && { r = in.read(chunk, got, want - got); r >= 0 })
          got += r
        if (r < 0) eof = true
        if (got == 0) false
        else {
          val nb = new Array[Byte](buf.length + got)
          System.arraycopy(buf, 0, nb, 0, buf.length)
          System.arraycopy(chunk, 0, nb, buf.length, got)
          buf = nb
          true
        }
      }
      /** Drop buf[0, from) — every live index must be rebased by caller. */
      private def compact(from: Int): Unit = if (from > 0) {
        buf = java.util.Arrays.copyOfRange(buf, from, buf.length)
        base += from
      }
      private def advance(): Unit = {
        row = null
        while (row == null) {
          val m = nextMagic(buf, scanPos)
          if (m < 0) {
            // no magic in the window: keep only a magic-prefix tail
            val keep = math.max(scanPos, buf.length - (Magic.length - 1))
            compact(keep)
            scanPos = 0
            if (!fill(chunkSize)) { done = true; return }
          } else {
            parseRecord(buf, m) match {
              case Right((off, url, wtype, date, clen, payload, end)) =>
                row = WarcRow(name, idx, base + off, url, wtype, date, clen, payload)
                idx += 1
                compact(end)
                scanPos = 0
              case Left((resume, needMore)) =>
                if (needMore && !eof) {
                  // the record may simply span the window: anchor the
                  // window at its start and read on (bounded by ONE
                  // record; geometric want keeps the copying linear)
                  compact(m)
                  scanPos = 0
                  fill(math.max(chunkSize, buf.length))
                } else {
                  // structural malformation (or truncation at real EOF):
                  // the parseFile resync rule, start + 1
                  scanPos = resume
                }
            }
          }
        }
      }

      override def hasNext: Boolean = {
        if (row == null && !done) advance()
        row != null
      }
      override def next(): WarcRow = {
        if (!hasNext) throw new NoSuchElementException("WARC stream exhausted")
        val r = row
        row = null
        r
      }
    }
  }

  /** Distributed STREAMING reader: same rows and schema as [[read]], but
    * each task streams its file through [[parseStream]] — memory per task
    * is O(largest record), so multi-GB archives (decompressed) no longer
    * need to fit in executor memory. File paths come from the binaryFile
    * source with the content column pruned away (a metadata-only listing);
    * one shuffle on the raw path spreads files across tasks; streams are
    * closed on task completion. */
  def readStreaming(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val files = spark.read.format("binaryFile").load(path)
      .select(col("path")).as[String]
    val hc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    files.repartition(col("path"))
      .flatMap { p =>
        // Path(String) accepts both the URI form binaryFile emits and raw
        // paths (a bare new URI(p) throws on unencoded spaces)
        val hp = new org.apache.hadoop.fs.Path(p)
        val fs = hp.getFileSystem(hc.value.value)
        val in = fs.open(hp)
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => in.close()))
        parseStream(p.substring(p.lastIndexOf('/') + 1), in)
      }
      .toDF()
  }
}
