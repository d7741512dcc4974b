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

  /** Full per-document pipeline: split → merge → overlap → enumerate →
    * hash → in-doc exact dedup. `docHash` is the document's content hash
    * (sha256 of the raw bytes), the id namespace per K5. */
  def chunkDocument(url: String, docHash: String, text: String): Vector[ChunkRow] = {
    val texts = withOverlap(mergeParagraphs(splitParagraphs(text)))
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
