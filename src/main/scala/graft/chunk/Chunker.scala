package graft.chunk

import graft.{ChunkRow, Hashing}
import scala.collection.mutable.ArrayBuffer

/** Paragraph chunker with the reference's exact semantics, frozen:
  *
  *  - K1 split  (reference: src/services/RAG/chunking.py:6-10): normalize
  *    `\r\n?` → `\n`, split on `\n\s*\n`, strip, drop empties; fallback to
  *    the whole trimmed text when no paragraph survives.
  *  - K2 merge  (chunking.py:13-26): greedily accumulate paragraphs while
  *    the buffer is below `min` (200) or the next paragraph still fits
  *    `max` (1600) including the "\n\n" joiner.
  *  - K3 overlap (chunking.py:29-42): tail = previous chunk's last 80 chars;
  *    iff the tail's FIRST space is at index > 0, cut forward past it (a
  *    leading-space tail is kept whole, spaces and all); join tail + " " +
  *    chunk unconditionally — no trimming. Exact reference semantics,
  *    including the leading space the join produces when the tail starts
  *    with (or trims to) a space.
  *  - K5 ids    (convert_to_embeddings.py:383,390-391,413): chunk_hash =
  *    sha1(chunk text); id = sha1("{doc_hash}:{idx}:{chunk_hash}"); duplicate
  *    rows id = sha1("{doc_hash}:{idx}:{orig_hash}:dup").
  *  - D1 dedup  (chunking.py:45-61): within a document, first occurrence of
  *    a chunk hash wins; later occurrences become metadata-only rows with
  *    `duplicate_of_index` = the kept chunk's index.
  */
object Chunker {

  val MinChars = 200
  val MaxChars = 1600
  val OverlapChars = 80

  def splitParagraphs(text: String): Vector[String] = {
    // fast path: no CR → skip the normalization regex entirely
    val norm = if (text.indexOf('\r') < 0) text else text.replaceAll("\r\n?", "\n")
    val parts = norm.split("\n\\s*\n").iterator.map(_.trim).filter(_.nonEmpty).toVector
    if (parts.isEmpty) {
      val whole = norm.trim
      if (whole.isEmpty) Vector.empty else Vector(whole)
    } else parts
  }

  def mergeParagraphs(paras: Vector[String], minChars: Int = MinChars, maxChars: Int = MaxChars): Vector[String] = {
    val out = Vector.newBuilder[String]
    val buf = new StringBuilder
    paras.foreach { p =>
      if (buf.isEmpty) buf.append(p)
      else if (buf.length < minChars || buf.length + 2 + p.length <= maxChars) {
        buf.append("\n\n"); buf.append(p)
      } else {
        out += buf.toString
        buf.clear(); buf.append(p)
      }
    }
    if (buf.nonEmpty) out += buf.toString
    out.result()
  }

  /** Last-80-chars overlap prefix, reference chunking.py:36-39 verbatim:
    * cut forward past the first space iff it sits at index > 0. */
  def overlapTail(prev: String, overlap: Int = OverlapChars): String = {
    val tail = prev.substring(math.max(0, prev.length - overlap))
    val sp = tail.indexOf(' ')
    if (sp > 0) tail.substring(sp + 1) else tail
  }

  def withOverlap(chunks: Vector[String]): Vector[String] =
    if (chunks.length <= 1) chunks
    else chunks.zipWithIndex.map { case (c, i) =>
      if (i == 0) c else overlapTail(chunks(i - 1)) + " " + c
    }

  /** Fused split → merge → overlap over index ranges: produces exactly
    * `withOverlap(mergeParagraphs(splitParagraphs(text)))` (property-tested)
    * while building each output chunk string once — no intermediate
    * paragraph or merged-chunk strings. The chunker runs per document on the
    * extraction hot path, so the saved copies are DRAM bandwidth at scale. */
  def chunkTexts(text: String): Vector[String] = {
    // CR normalization is a rewrite anyway — take the reference path (rare:
    // the extractor's output never contains \r)
    if (text.indexOf('\r') >= 0)
      return withOverlap(mergeParagraphs(splitParagraphs(text)))
    val n = text.length
    // K1: trimmed paragraph ranges; a separator is a whitespace run holding
    // >= 2 newlines (== \n\s*\n up to the per-part trim)
    val ps = new ArrayBuffer[Long]() // packed (start << 32 | end)
    // trim == String.trim (chars <= ' '), NOT Character.isWhitespace —
    // byte-identity with the reference path's _.trim
    def addPart(s0: Int, e0: Int): Unit = {
      var s = s0; var e = e0
      while (s < e && text.charAt(s) <= ' ') s += 1
      while (e > s && text.charAt(e - 1) <= ' ') e -= 1
      if (e > s) ps += ((s.toLong << 32) | e)
    }
    // regex \s is ASCII [ \t\n\x0B\f\r] in Java — match it exactly
    @inline def isRegexWs(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
    var i = 0
    var partStart = 0
    while (i < n) {
      if (text.charAt(i) == '\n') {
        var j = i; var nl = 0
        while (j < n && isRegexWs(text.charAt(j))) {
          if (text.charAt(j) == '\n') nl += 1
          j += 1
        }
        if (nl >= 2) { addPart(partStart, i); partStart = j }
        i = j
      } else i += 1
    }
    addPart(partStart, n)
    if (ps.isEmpty) {
      addPart(0, n) // fallback: the whole trimmed text (empty → no chunks)
      if (ps.isEmpty) return Vector.empty
    }

    // K2 greedy merge over range lengths
    val chunkRanges = new ArrayBuffer[ArrayBuffer[Long]]()
    var cur = new ArrayBuffer[Long]()
    var curLen = 0
    ps.foreach { p =>
      val s = (p >>> 32).toInt; val e = (p & 0xffffffffL).toInt
      val plen = e - s
      if (cur.isEmpty) { cur += p; curLen = plen }
      else if (curLen < MinChars || curLen + 2 + plen <= MaxChars) { cur += p; curLen += 2 + plen }
      else { chunkRanges += cur; cur = new ArrayBuffer[Long](); cur += p; curLen = plen }
    }
    if (cur.nonEmpty) chunkRanges += cur

    // K3: last-80-chars tail of the previous BASE chunk, straight from its
    // ranges (the virtual string ranges-joined-by-"\n\n")
    def tailOf(ranges: ArrayBuffer[Long]): String = {
      var total = -2
      ranges.foreach(p => total += ((p & 0xffffffffL).toInt - (p >>> 32).toInt) + 2)
      val take = math.min(OverlapChars, total)
      val arr = new Array[Char](take)
      var w = take - 1
      var ri = ranges.length - 1
      while (w >= 0) {
        val s = (ranges(ri) >>> 32).toInt; val e = (ranges(ri) & 0xffffffffL).toInt
        var p = e - 1
        while (p >= s && w >= 0) { arr(w) = text.charAt(p); w -= 1; p -= 1 }
        if (w >= 0) { arr(w) = '\n'; w -= 1 }
        if (w >= 0) { arr(w) = '\n'; w -= 1 }
        ri -= 1
      }
      val tail = new String(arr)
      val sp = tail.indexOf(' ')
      if (sp > 0) tail.substring(sp + 1) else tail
    }

    val out = Vector.newBuilder[String]
    var ci = 0
    while (ci < chunkRanges.length) {
      val ranges = chunkRanges(ci)
      val tail = if (ci == 0 || chunkRanges.length <= 1) "" else tailOf(chunkRanges(ci - 1))
      var len = (if (ci > 0) tail.length + 1 else 0) - 2
      ranges.foreach(p => len += ((p & 0xffffffffL).toInt - (p >>> 32).toInt) + 2)
      val sb = new java.lang.StringBuilder(len)
      if (ci > 0) { sb.append(tail); sb.append(' ') }
      var ri = 0
      while (ri < ranges.length) {
        if (ri > 0) sb.append("\n\n")
        sb.append(text, (ranges(ri) >>> 32).toInt, (ranges(ri) & 0xffffffffL).toInt)
        ri += 1
      }
      out += sb.toString
      ci += 1
    }
    out.result()
  }

  /** Full per-document pipeline: split → merge → overlap → enumerate →
    * hash → in-doc exact dedup. `docHash` is the document's content hash
    * (sha256 of the raw bytes), the id namespace per K5. */
  def chunkDocument(url: String, docHash: String, text: String): Vector[ChunkRow] = {
    val texts = chunkTexts(text)
    if (texts.isEmpty) return Vector.empty
    val total = texts.length
    val firstByHash = scala.collection.mutable.Map.empty[String, Int]
    val rows = new ArrayBuffer[ChunkRow](total)
    texts.zipWithIndex.foreach { case (t, i) =>
      val h = Hashing.sha1Hex(t)
      firstByHash.get(h) match {
        case None =>
          firstByHash(h) = i
          rows += ChunkRow(Hashing.sha1Hex(s"$docHash:$i:$h"), url, i, total, t, h,
            is_duplicate = false, duplicate_of_index = -1)
        case Some(first) =>
          rows += ChunkRow(Hashing.sha1Hex(s"$docHash:$i:$h:dup"), url, i, total, t, h,
            is_duplicate = true, duplicate_of_index = first)
      }
    }
    rows.toVector
  }
}
