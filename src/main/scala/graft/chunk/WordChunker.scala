package graft.chunk

import scala.collection.mutable.ArrayBuffer

/** Word-budget chunker — the reference's second chunking scheme
  * (reference: src/utils/course_outline/rag_py.py:182-200
  * `intelligent_chunking`), frozen semantics:
  *
  *  - strip the text; drop page-break markers (`\n?-+ PAGE BREAK -+\n?` →
  *    "\n\n"); split paragraphs on `\n\s*\n`; skip blank paragraphs
  *  - greedily accumulate paragraphs while the word budget (300) holds —
  *    note the reference joins with "\n\n" even into an empty buffer, so a
  *    first paragraph that fits enters as "\n\n"+para (stripped on emit)
  *  - on overflow with a non-empty buffer: emit buffer.strip(), start the
  *    next buffer with the last 50 words of the PREVIOUS buffer + "\n\n" +
  *    the new paragraph
  *  - an oversized first paragraph becomes the buffer whole
  *  - final filter: only chunks with >= 20 words survive
  */
object WordChunker {

  val MaxWords = 300
  val OverlapWords = 50
  val MinWords = 20

  private val PageBreak = java.util.regex.Pattern.compile("\\n?-+ PAGE BREAK -+\\n?")
  private val ParaSplit = java.util.regex.Pattern.compile("\\n\\s*\\n")

  /** Python str.split()-equivalent word count (whitespace-delimited,
    * empties dropped) without materializing the words. */
  def wordCount(s: String): Int = {
    var c = 0; var in = false; var i = 0
    while (i < s.length) {
      if (Character.isWhitespace(s.charAt(i))) in = false
      else if (!in) { c += 1; in = true }
      i += 1
    }
    c
  }

  private def splitWords(s: String): Array[String] =
    s.split("\\s+").filter(_.nonEmpty)

  /** The reference's THIRD chunking scheme (reference: main.py:160-187
    * `chunk_text`), frozen: pages joined with the page-break marker, markers
    * collapsed to "\n\n", paragraphs split/stripped, then a greedy 1000-char
    * budget where the running buffer RETAINS its trailing "\n\n" joiner in
    * the length check, chunks emitted `.strip()`ed. `byParagraph = true`
    * returns the stripped paragraphs themselves. */
  def chunkPages(pages: Seq[String], maxChars: Int = 1000,
                 byParagraph: Boolean = false): Vector[String] = {
    val text0 = pages.mkString("\n\n--- PAGE BREAK ---\n\n")
    val text = PageBreak.matcher(text0).replaceAll("\n\n")
    val paragraphs = ParaSplit.split(text, -1).iterator.map(_.trim).filter(_.nonEmpty).toVector
    if (byParagraph) return paragraphs
    val chunks = new ArrayBuffer[String]()
    var cur = ""
    paragraphs.foreach { para =>
      if (cur.length + para.length < maxChars) cur = cur + para + "\n\n"
      else {
        if (cur.trim.nonEmpty) chunks += cur.trim
        cur = para + "\n\n"
      }
    }
    if (cur.trim.nonEmpty) chunks += cur.trim
    chunks.toVector
  }

  def chunk(text: String, maxWords: Int = MaxWords, overlapWords: Int = OverlapWords,
            minWords: Int = MinWords): Vector[String] = {
    if (text.trim.isEmpty) return Vector.empty
    val cleaned = PageBreak.matcher(text.trim).replaceAll("\n\n")
    val paragraphs = ParaSplit.split(cleaned, -1)
    val chunks = new ArrayBuffer[String]()
    var cur = ""
    paragraphs.foreach { para =>
      if (para.trim.nonEmpty) {
        if (wordCount(cur) + wordCount(para) <= maxWords) cur = cur + "\n\n" + para
        else if (cur.nonEmpty) {
          chunks += cur.trim
          val ws = splitWords(cur)
          val overlap = ws.slice(math.max(0, ws.length - overlapWords), ws.length).mkString(" ")
          cur = overlap + "\n\n" + para
        } else cur = para
      }
    }
    if (cur.nonEmpty) chunks += cur.trim
    chunks.filter(c => wordCount(c) >= minWords).toVector
  }
}
