package graft.extract.html

import scala.collection.mutable.ArrayBuffer

/** Hyperlink extraction — the web-graph feed (hrefs + anchor texts in
  * document order), the upstream producer for the PageRank / anchor-text
  * operators ([[graft.graph]]). A standalone single-pass scanner:
  * [[HtmlExtractor]]'s tokenizer deliberately ignores attributes (and its
  * constants are frozen under the byte-identity contract), so link
  * extraction reuses its CONVENTIONS — comment/raw-text skipping, quoted
  * attribute scanning, entity decoding, `<= ' '` trim — without touching
  * it.
  *
  * Rules (documented, deterministic):
  *   - a link is an `<a>` with an `href` attribute; anchors without href
  *     (named anchors) are ignored
  *   - anchor text is the whitespace-collapsed, entity-decoded character
  *     data until the matching `</a>`; markup inside the anchor
  *     contributes text only (`<b>x</b>` → "x")
  *   - a new `<a>` while one is open implicitly closes the first (HTML
  *     forbids nesting); self-closing `<a/>` emits an empty anchor;
  *     an anchor left open at EOF is dropped as unterminated
  *   - `<script>`/`<style>` bodies and comments never produce links
  */
object LinkExtractor {

  final case class Link(pos: Int, href: String, anchor: String)

  def links(bytes: Array[Byte]): Vector[Link] =
    links(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))

  def links(html: String): Vector[Link] = {
    val out = new ArrayBuffer[Link]()
    val sb = new StringBuilder
    val n = html.length
    var i = 0
    var inAnchor = false
    var href: String = null
    var lastWasSpace = true

    def appendChar(c: Char): Unit = {
      if (Character.isWhitespace(c)) {
        if (!lastWasSpace) { sb.append(' '); lastWasSpace = true }
      } else { sb.append(c); lastWasSpace = false }
    }

    // minimal entity decode, the HtmlExtractor set
    def appendEntity(at: Int): Int = {
      val semi = html.indexOf(';', at + 1)
      if (semi < 0 || semi - at > 10) { appendChar('&'); return at + 1 }
      html.substring(at + 1, semi) match {
        case "amp"          => appendChar('&'); semi + 1
        case "lt"           => appendChar('<'); semi + 1
        case "gt"           => appendChar('>'); semi + 1
        case "quot"         => appendChar('"'); semi + 1
        case "apos" | "#39" => appendChar('\''); semi + 1
        case "nbsp"         => appendChar(' '); semi + 1
        case _              => appendChar('&'); at + 1
      }
    }

    def emit(): Unit = {
      if (inAnchor && href != null) {
        var s = 0; var e = sb.length
        while (s < e && sb.charAt(s) <= ' ') s += 1
        while (e > s && sb.charAt(e - 1) <= ' ') e -= 1
        out += Link(out.length + 1, href, sb.substring(s, e))
      }
      sb.clear(); lastWasSpace = true; inAnchor = false; href = null
    }

    def nameAt(at: Int, name: String): Boolean = {
      // tag name match with a word boundary after it
      if (!html.regionMatches(true, at, name, 0, name.length)) return false
      val after = at + name.length
      after >= n || !html.charAt(after).isLetterOrDigit
    }

    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else if (i + 1 < n && (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?')) {
          val end = html.indexOf('>', i)
          i = if (end < 0) n else end + 1
        } else if (nameAt(i + 1, "script") || nameAt(i + 1, "style")) {
          val closer = if (nameAt(i + 1, "script")) "</script" else "</style"
          var k = i + 1
          var found = -1
          while (found < 0 && k < n) {
            val idx = html.indexOf('<', k)
            if (idx < 0) k = n
            else if (html.regionMatches(true, idx, closer, 0, closer.length)) found = idx
            else k = idx + 1
          }
          i = if (found < 0) n
              else { val ge = html.indexOf('>', found); if (ge < 0) n else ge + 1 }
        } else {
          var j = i + 1
          var closing = false
          if (j < n && html.charAt(j) == '/') { closing = true; j += 1 }
          val nameStart = j
          while (j < n && html.charAt(j).isLetterOrDigit) j += 1
          if (j == nameStart) { if (inAnchor) appendChar('<'); i += 1 }
          else {
            val isA = j - nameStart == 1 &&
              (html.charAt(nameStart) == 'a' || html.charAt(nameStart) == 'A')
            // scan to '>' honoring quoted attribute values; collect href.
            // tagEnd sentinel is -1, NOT n: a '>' at the very last index
            // sets tagEnd == n, which a `tagEnd == n` loop guard cannot
            // distinguish from "still scanning" (infinite loop)
            var quote: Char = 0
            var tagEnd = -1
            var selfClose = false
            var attrHref: String = null
            var k = j
            while (tagEnd < 0 && k < n) {
              val ch = html.charAt(k)
              if (quote != 0) { if (ch == quote) quote = 0; k += 1 }
              else if (ch == '"' || ch == '\'') { quote = ch; k += 1 }
              else if (ch == '>') { selfClose = k > j && html.charAt(k - 1) == '/'; tagEnd = k + 1 }
              else if (!closing && attrHref == null && ch.isLetter &&
                       html.regionMatches(true, k, "href", 0, 4) && {
                         val p = html.charAt(k - 1) // k > j >= 1 always
                         !p.isLetterOrDigit && p != '-' // not data-href etc.
                       }) {
                var v = k + 4
                while (v < n && html.charAt(v) <= ' ') v += 1
                if (v < n && html.charAt(v) == '=') {
                  v += 1
                  while (v < n && html.charAt(v) <= ' ') v += 1
                  if (v < n && (html.charAt(v) == '"' || html.charAt(v) == '\'')) {
                    val q = html.charAt(v)
                    val e = html.indexOf(q, v + 1)
                    attrHref = if (e < 0) html.substring(v + 1) else html.substring(v + 1, e)
                    k = if (e < 0) n else e + 1
                  } else {
                    var e = v
                    while (e < n && html.charAt(e) > ' ' && html.charAt(e) != '>') e += 1
                    attrHref = html.substring(v, e)
                    k = e
                  }
                } else k += 4 // bare href attribute (no value): not a link
              } else k += 1
            }
            if (isA) {
              if (closing) emit()
              else {
                if (inAnchor) emit() // implicit close of the open anchor
                if (attrHref != null) {
                  inAnchor = true; href = attrHref
                  if (selfClose) emit()
                }
              }
            }
            // non-anchor tags inside an anchor: markup contributes no text
            i = if (tagEnd < 0) n else tagEnd // no '>': truncated tag, stop
          }
        }
      } else if (c == '&') {
        if (inAnchor) i = appendEntity(i) else i += 1
      } else {
        if (inAnchor) appendChar(c)
        i += 1
      }
    }
    out.toVector // an anchor still open at EOF is unterminated: dropped
  }
}
