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

  // ------------------------------------------------- zero-alloc tag lookup
  // The tokenizer classifies every tag of every page; substring+toLowerCase
  // per tag is the single biggest small-object source in the HTML hot path.
  // Known tags resolve to (flags, canonical interned name) by comparing the
  // raw chars case-insensitively — no allocation for known OR unknown tags.
  private final val FBlock = 1
  private final val FRaw = 2
  private final val FContainer = 4
  private final val FAnchor = 8

  private val TagTable: Array[Array[String]] = {
    val all = (BlockTags ++ RawTextTags ++ ContainerTags + "a").toArray
    val byFirst = Array.fill(26)(Array.empty[String])
    for (c <- 0 until 26) byFirst(c) = all.filter(_.head - 'a' == c).sortBy(_.length)
    byFirst
  }
  private val TagFlags: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    (BlockTags ++ RawTextTags ++ ContainerTags + "a").foreach { t =>
      var f = 0
      if (BlockTags.contains(t)) f |= FBlock
      if (RawTextTags.contains(t)) f |= FRaw
      if (ContainerTags.contains(t)) f |= FContainer
      if (t == "a") f |= FAnchor
      m.put(t, f)
    }
    m
  }
  private val RawCloser: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String]()
    RawTextTags.foreach(t => m.put(t, "</" + t))
    m
  }

  @inline private def lowerAscii(c: Char): Char =
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c

  /** Canonical interned name of the tag at html[start,end), or null when the
    * tag is none we classify. Case-insensitive, allocation-free. */
  private def knownTag(html: String, start: Int, end: Int): String = {
    val len = end - start
    if (len < 1 || len > 10) return null
    val c0 = lowerAscii(html.charAt(start))
    if (c0 < 'a' || c0 > 'z') return null
    val cands = TagTable(c0 - 'a')
    var k = 0
    while (k < cands.length) {
      val cand = cands(k)
      if (cand.length == len) {
        var j = 1
        while (j < len && lowerAscii(html.charAt(start + j)) == cand.charAt(j)) j += 1
        if (j == len) return cand
      }
      k += 1
    }
    null
  }

  private def regionEq(html: String, start: Int, len: Int, lit: String): Boolean = {
    if (len != lit.length) return false
    var j = 0
    while (j < len && html.charAt(start + j) == lit.charAt(j)) j += 1
    j == len
  }

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
    * raw-text elements, entities, and attribute values containing '>'.
    * Hot path: per-tag and per-entity handling is allocation-free (the only
    * allocations are the kept block strings themselves). */
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
      // exact String.trim semantics: strip chars <= ' ' (0x20) at BOTH ends.
      // Whitespace-collapse leaves at most one leading/trailing ' ', but
      // non-whitespace control chars (U+0000-U+0008, U+000E-U+001B — raw or
      // via numeric entities) are appended verbatim with lastWasSpace=false,
      // so edges can hold runs of them; the scan is O(trimmed) — 0-1 chars on
      // clean markup — and byte-identical to the original sb.toString.trim.
      var start = 0
      var end = sb.length
      while (start < end && sb.charAt(start) <= ' ') start += 1
      while (end > start && sb.charAt(end - 1) <= ' ') end -= 1
      if (end > start) {
        val text = sb.substring(start, end)
        out += Block(text, math.min(linkChars, text.length), blockInContainer, blockKind)
      }
      sb.clear()
      linkChars = 0
      lastWasSpace = true
      blockInContainer = containerDepth > 0
    }

    def appendChar(c: Char): Unit = {
      if (Character.isWhitespace(c)) {
        if (!lastWasSpace) { sb.append(' '); if (linkDepth > 0) linkChars += 1; lastWasSpace = true }
      } else {
        sb.append(c); if (linkDepth > 0) linkChars += 1; lastWasSpace = false
      }
    }

    /** Decode the entity at html(i) == '&' into the block buffer; returns the
      * next index. Unknown/invalid entities emit '&' and continue at i+1. */
    def appendEntity(i: Int): Int = {
      val semi = html.indexOf(';', i + 1)
      if (semi < 0 || semi - i > 10) { appendChar('&'); return i + 1 }
      val s = i + 1
      val len = semi - s
      if (regionEq(html, s, len, "amp")) { appendChar('&'); semi + 1 }
      else if (regionEq(html, s, len, "lt")) { appendChar('<'); semi + 1 }
      else if (regionEq(html, s, len, "gt")) { appendChar('>'); semi + 1 }
      else if (regionEq(html, s, len, "quot")) { appendChar('"'); semi + 1 }
      else if (regionEq(html, s, len, "apos") || regionEq(html, s, len, "#39")) { appendChar('\''); semi + 1 }
      else if (regionEq(html, s, len, "nbsp")) { appendChar(' '); semi + 1 }
      else if (len >= 2 && html.charAt(s) == '#') {
        val hex = html.charAt(s + 1) == 'x' || html.charAt(s + 1) == 'X'
        var j = s + (if (hex) 2 else 1)
        var cp = 0L
        var ok = j < semi
        while (j < semi && ok) {
          val d = Character.digit(html.charAt(j), if (hex) 16 else 10)
          if (d < 0) ok = false
          else { cp = cp * (if (hex) 16 else 10) + d; if (cp > Int.MaxValue) ok = false; j += 1 }
        }
        if (ok && Character.isValidCodePoint(cp.toInt)) {
          val c = cp.toInt
          if (c < 0x10000) appendChar(c.toChar)
          else { appendChar(Character.highSurrogate(c)); appendChar(Character.lowSurrogate(c)) }
          semi + 1
        } else { appendChar('&'); i + 1 }
      }
      else { appendChar('&'); i + 1 }
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
          // CDATA is character data, markup-opaque
          val end = html.indexOf("]]>", i + 9)
          val stop = if (end < 0) n else end
          var k = i + 9
          while (k < stop) { appendChar(html.charAt(k)); k += 1 }
          i = if (end < 0) n else end + 3
        } else if (i + 1 < n && (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?')) {
          val end = html.indexOf('>', i)
          i = if (end < 0) n else end + 1
        } else {
          // inline tag parse: name span, then scan to '>' honoring quoted
          // attribute values
          var j = i + 1
          var closing = false
          if (j < n && html.charAt(j) == '/') { closing = true; j += 1 }
          val nameStart = j
          while (j < n && html.charAt(j).isLetterOrDigit) j += 1
          if (j == nameStart) { appendChar('<'); i += 1 }
          else {
            val nameEnd = j
            var quote: Char = 0
            var tagEnd = n
            var scanning = true
            while (scanning && j < n) {
              val ch = html.charAt(j)
              if (quote != 0) { if (ch == quote) quote = 0 }
              else if (ch == '"' || ch == '\'') quote = ch
              else if (ch == '>') { tagEnd = j + 1; scanning = false }
              j += 1
            }
            val canon = knownTag(html, nameStart, nameEnd)
            if (canon == null) i = tagEnd // unclassified tag: skip, text flows on
            else {
              val flags = TagFlags.get(canon).intValue()
              if (!closing && (flags & FRaw) != 0) {
                // skip to matching close tag (case-insensitive scan, no copy)
                var k = indexOfIgnoreCase(html, RawCloser.get(canon), tagEnd)
                if (k < 0) k = n
                else { val ge = html.indexOf('>', k); k = if (ge < 0) n else ge + 1 }
                i = k
              } else {
                if ((flags & FBlock) != 0) flush()
                if ((flags & FContainer) != 0) {
                  if (closing) containerDepth = math.max(0, containerDepth - 1)
                  else containerDepth += 1
                  blockInContainer = containerDepth > 0
                }
                if ((flags & FAnchor) != 0) {
                  if (closing) linkDepth = math.max(0, linkDepth - 1) else linkDepth += 1
                }
                if (!closing && (flags & FBlock) != 0) blockKind = canon
                i = tagEnd
              }
            }
          }
        }
      } else if (c == '&') {
        i = appendEntity(i)
      } else {
        if (Character.isWhitespace(c)) {
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

  private def density(b: Block): Double = b.linkChars.toDouble / math.max(b.text.length, 1)

  /** Standalone multi-factor block analysis (SURVEY.md §2.3 C3 — the
    * reference's multi-signal needs-OCR decision, ocr_engine.py:269-280,
    * re-expressed for the web domain): every factor the tier classifier
    * consumes, per block, plus the tier the block would land in. Lets a
    * pipeline inspect WHY content was kept or dropped without re-running
    * extraction. */
  final case class BlockSignal(kind: String, words: Int, eff_chars: Int,
                               link_density: Double, in_container: Boolean, tier: String)

  def blockSignals(html: String): Vector[BlockSignal] =
    tokenize(html).map { b =>
      val w = words(b.text)
      val d = density(b)
      val tier =
        if (!b.inContainer && w >= 10 && d <= 0.33) "strict"
        else if (!b.inContainer && w >= 3 && d <= 0.50) "lenient"
        else "body"
      BlockSignal(if (b.kind.isEmpty) "text" else b.kind, w, effectiveChars(b.text),
        d, b.inContainer, tier)
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

    tier(b => !b.inContainer && words(b.text) >= 10 && density(b) <= 0.33, "strict")
      .orElse(tier(b => !b.inContainer && words(b.text) >= 3 && density(b) <= 0.50, "lenient"))
      .orElse(tier(b => b.text.nonEmpty, "body"))
      .getOrElse(Result("", Nil, "empty_text", 0))
  }
}
