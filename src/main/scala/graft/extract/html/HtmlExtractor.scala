package graft.extract.html

import graft.Span
import scala.collection.mutable.ArrayBuffer

/** From-scratch DOM boilerplate stripper: tag tokenizer → block builder →
  * text-density + link-density classifier (Boilerpipe/trafilatura-class
  * heuristics), per the north rule.
  *
  * This is the HTML analog of the reference's OCR path: the classifier
  * replaces the OCR-confidence filter (keep lines with conf >= 0.35,
  * reference: src/services/RAG/ocr_engine.py:146) and the fallback tiers
  * replace the DPI ladder degradation (ocr_engine.py:115-204) — strict →
  * lenient → whole-body, so a page never silently yields empty text when
  * content exists (SURVEY.md §2.4 X2).
  *
  * ALL constants here are part of the byte-identity contract
  * (SURVEY.md §7.4) and must never change once golden fixtures are pinned:
  *   - whitespace collapsed to single spaces inside a block, blocks trimmed
  *   - blocks joined with "\n\n"
  *   - strict tier:  words >= 10 && linkDensity <= 0.33, outside
  *     nav/header/footer/aside
  *   - lenient tier: words >= 3  && linkDensity <= 0.50, outside containers
  *   - body tier:    any non-empty block anywhere
  *   - a tier wins iff its joined text has >= 50 effective (non-ws) chars —
  *     the reference's empty-text gate (ocr_engine.py:229-235: effective
  *     chars < 50 => treat as empty)
  */
object HtmlExtractor {

  /** Tags that terminate the current text block. */
  private val BlockTags: Set[String] = Set(
    "address", "article", "aside", "blockquote", "br", "caption", "dd",
    "div", "dl", "dt", "fieldset", "figcaption", "figure", "footer", "form",
    "h1", "h2", "h3", "h4", "h5", "h6", "header", "hr", "li", "main", "nav",
    "ol", "p", "pre", "section", "table", "tbody", "td", "tfoot", "th",
    "thead", "tr", "ul", "body", "html", "title")

  /** Raw-text elements whose content is never text. */
  private val RawTextTags: Set[String] = Set("script", "style", "noscript", "svg", "template")

  /** Boilerplate containers: text inside them is excluded from the strict
    * and lenient tiers. */
  private val ContainerTags: Set[String] = Set("nav", "header", "footer", "aside")

  final case class Block(
      text: String,          // whitespace-collapsed, trimmed
      linkChars: Int,        // chars contributed while inside <a>
      inContainer: Boolean,  // opened while inside nav/header/footer/aside
      kind: String)          // tag name that opened the block ("" unknown)

  final case class Result(text: String, spans: Seq[Span], method: String, nBlocks: Int)

  def extract(html: String): Result = {
    val blocks = tokenize(html)
    classify(blocks)
  }

  def extract(bytes: Array[Byte]): Result =
    extract(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))

  // ---------------------------------------------------------------- tokenizer

  /** Single pass over the markup; no DOM is built. Handles comments,
    * raw-text elements, entities, and attribute values containing '>'. */
  def tokenize(html: String): Vector[Block] = {
    val out = new ArrayBuffer[Block]()
    val sb = new StringBuilder
    var linkChars = 0
    var linkDepth = 0
    var containerDepth = 0
    var blockKind = ""
    var blockInContainer = false
    var lastWasSpace = true // collapse leading ws

    def flush(): Unit = {
      val text = sb.toString.trim
      if (text.nonEmpty) out += Block(text, math.min(linkChars, text.length), blockInContainer, blockKind)
      sb.clear()
      linkChars = 0
      lastWasSpace = true
      blockInContainer = containerDepth > 0
    }

    def appendText(s: String): Unit = {
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (Character.isWhitespace(c) || c == ' ') {
          if (!lastWasSpace) { sb.append(' '); if (linkDepth > 0) linkChars += 1; lastWasSpace = true }
        } else {
          sb.append(c); if (linkDepth > 0) linkChars += 1; lastWasSpace = false
        }
        i += 1
      }
    }

    val n = html.length
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else if (html.startsWith("<![CDATA[", i)) {
          val end = html.indexOf("]]>", i + 9)
          val body = html.substring(i + 9, if (end < 0) n else end)
          appendText(body) // CDATA is character data, markup-opaque
          i = if (end < 0) n else end + 3
        } else if (i + 1 < n && (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?')) {
          val end = html.indexOf('>', i)
          i = if (end < 0) n else end + 1
        } else {
          val (name, closing, tagEnd) = parseTag(html, i)
          if (name.isEmpty) { appendText("<"); i += 1 }
          else {
            val lname = name
            if (!closing && RawTextTags.contains(lname)) {
              // skip to matching close tag (case-insensitive scan, no copy)
              var j = indexOfIgnoreCase(html, "</" + lname, tagEnd)
              if (j < 0) j = n
              else { val ge = html.indexOf('>', j); j = if (ge < 0) n else ge + 1 }
              i = j
            } else {
              if (BlockTags.contains(lname)) flush()
              if (ContainerTags.contains(lname)) {
                if (closing) containerDepth = math.max(0, containerDepth - 1)
                else containerDepth += 1
                blockInContainer = containerDepth > 0
              }
              if (lname == "a") {
                if (closing) linkDepth = math.max(0, linkDepth - 1) else linkDepth += 1
              }
              if (!closing && BlockTags.contains(lname)) blockKind = lname
              i = tagEnd
            }
          }
        }
      } else if (c == '&') {
        val (decoded, next) = decodeEntity(html, i)
        appendText(decoded)
        i = next
      } else {
        if (Character.isWhitespace(c) || c == ' ') {
          if (!lastWasSpace) { sb.append(' '); if (linkDepth > 0) linkChars += 1; lastWasSpace = true }
        } else {
          sb.append(c); if (linkDepth > 0) linkChars += 1; lastWasSpace = false
        }
        i += 1
      }
    }
    flush()
    out.toVector
  }

  private def indexOfIgnoreCase(hay: String, needle: String, from: Int): Int = {
    val n = hay.length; val m = needle.length
    var i = math.max(from, 0)
    while (i <= n - m) {
      var j = 0
      while (j < m && Character.toLowerCase(hay.charAt(i + j)) == needle.charAt(j)) j += 1
      if (j == m) return i
      i += 1
    }
    -1
  }

  /** Parse a tag at `html(start) == '<'`. Returns (lowercased name, isClosing,
    * index after '>'). Attribute values may contain '>'. */
  private def parseTag(html: String, start: Int): (String, Boolean, Int) = {
    val n = html.length
    var i = start + 1
    var closing = false
    if (i < n && html.charAt(i) == '/') { closing = true; i += 1 }
    val nameStart = i
    while (i < n && (html.charAt(i).isLetterOrDigit)) i += 1
    if (i == nameStart) return ("", false, start + 1)
    val name = html.substring(nameStart, i).toLowerCase
    // scan to '>' honoring quoted attribute values
    var quote: Char = 0
    while (i < n) {
      val c = html.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '>') return (name, closing, i + 1)
      i += 1
    }
    (name, closing, n)
  }

  /** Decode one entity at `html(i) == '&'`; returns (text, nextIndex). */
  private def decodeEntity(html: String, i: Int): (String, Int) = {
    val n = html.length
    val semi = html.indexOf(';', i + 1)
    if (semi < 0 || semi - i > 10) return ("&", i + 1)
    val body = html.substring(i + 1, semi)
    val out: String = body match {
      case "amp"  => "&"
      case "lt"   => "<"
      case "gt"   => ">"
      case "quot" => "\""
      case "apos" | "#39" => "'"
      case "nbsp" => " "
      case b if b.startsWith("#x") || b.startsWith("#X") =>
        try String.valueOf(Character.toChars(Integer.parseInt(b.substring(2), 16)))
        catch { case _: Exception => "&" + body + ";" }
      case b if b.startsWith("#") =>
        try String.valueOf(Character.toChars(Integer.parseInt(b.substring(1))))
        catch { case _: Exception => "&" + body + ";" }
      case _ => "&" + body + ";"
    }
    if (out == "&" + body + ";") ("&", i + 1) else (out, semi + 1)
  }

  // --------------------------------------------------------------- classifier

  private def words(s: String): Int = {
    var c = 0; var in = false; var i = 0
    while (i < s.length) {
      val ws = s.charAt(i) == ' '
      if (!ws && !in) { c += 1; in = true } else if (ws) in = false
      i += 1
    }
    c
  }

  private def effectiveChars(s: String): Int = {
    var c = 0; var i = 0
    while (i < s.length) { if (!Character.isWhitespace(s.charAt(i))) c += 1; i += 1 }
    c
  }

  def classify(blocks: Vector[Block]): Result = {
    def tier(pred: Block => Boolean, name: String): Option[Result] = {
      val kept = blocks.filter(pred)
      if (kept.isEmpty) return None
      val sb = new StringBuilder
      val spans = new ArrayBuffer[Span](kept.length)
      kept.foreach { b =>
        if (sb.nonEmpty) sb.append("\n\n")
        val start = sb.length
        sb.append(b.text)
        spans += Span(start, sb.length, if (b.kind.isEmpty) "text" else b.kind)
      }
      val text = sb.toString
      if (effectiveChars(text) >= 50) Some(Result(text, spans.toVector, name, kept.length))
      else None
    }

    def density(b: Block): Double = b.linkChars.toDouble / math.max(b.text.length, 1)

    tier(b => !b.inContainer && words(b.text) >= 10 && density(b) <= 0.33, "strict")
      .orElse(tier(b => !b.inContainer && words(b.text) >= 3 && density(b) <= 0.50, "lenient"))
      .orElse(tier(b => b.text.nonEmpty, "body"))
      .getOrElse(Result("", Nil, "empty_text", 0))
  }
}
