package graft.extract.pdf

import scala.collection.mutable.ArrayBuffer

/** Byte-level tokenizer + object parser for PDF syntax.
  *
  * Re-implements (from the published PDF 1.7 spec, ISO 32000-1 §7.2-7.3) the
  * subset needed for text extraction; structurally the role PyMuPDF plays in
  * the reference (reference: src/services/RAG/ocr_engine.py:221-228).
  */
final class PdfLexer(val buf: Array[Byte], var pos: Int) {

  @inline private def isWs(c: Int): Boolean =
    c == 0 || c == 9 || c == 10 || c == 12 || c == 13 || c == 32
  @inline private def isDelim(c: Int): Boolean =
    c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
    c == '{' || c == '}' || c == '/' || c == '%'
  @inline private def at(i: Int): Int = if (i < buf.length && i >= 0) buf(i) & 0xff else -1

  def skipWs(): Unit = {
    graft.extract.TimeBudget.tick() // every token path passes through here
    var go = true
    while (go) {
      while (pos < buf.length && isWs(at(pos))) pos += 1
      if (at(pos) == '%') { // comment to EOL
        while (pos < buf.length && at(pos) != '\n' && at(pos) != '\r') pos += 1
      } else go = false
    }
  }

  def eof: Boolean = pos >= buf.length

  @inline private def kwEq(start: Int, len: Int, lit: String): Boolean = {
    var i = 0
    while (i < len && (buf(start + i) & 0xff) == lit.charAt(i)) i += 1
    i == len
  }

  /** Read a bare keyword/regular token (e.g. obj, endobj, stream, R, xref).
    * Known keywords/operators return interned constants — content-stream
    * interpretation reads one keyword per operator, so per-keyword String
    * allocation is a hot-path cost. */
  def readKeyword(): String = {
    skipWs()
    val start = pos
    while (pos < buf.length && !isWs(at(pos)) && !isDelim(at(pos))) pos += 1
    val len = pos - start
    if (len == 0) return ""
    val c0 = buf(start) & 0xff
    if (len == 1) {
      c0 match {
        case 'q' => return "q"
        case 'Q' => return "Q"
        case 'R' => return "R"
        case 'n' => return "n"
        case 'f' => return "f"
        case 'S' => return "S"
        case 'W' => return "W"
        case '\'' => return "'"
        case '"' => return "\""
        case _ =>
      }
    } else if (len == 2) {
      val c1 = buf(start + 1) & 0xff
      if (c0 == 'T') {
        c1 match {
          case 'd' => return "Td"
          case 'D' => return "TD"
          case 'j' => return "Tj"
          case 'J' => return "TJ"
          case 'm' => return "Tm"
          case 'f' => return "Tf"
          case 'L' => return "TL"
          case '*' => return "T*"
          case 'c' => return "Tc"
          case 'w' => return "Tw"
          case 'z' => return "Tz"
          case 'r' => return "Tr"
          case 's' => return "Ts"
          case _ =>
        }
      } else if (c0 == 'B' && c1 == 'T') return "BT"
      else if (c0 == 'E' && c1 == 'T') return "ET"
      else if (c0 == 'B' && c1 == 'I') return "BI"
      else if (c0 == 'E' && c1 == 'I') return "EI"
      else if (c0 == 'c' && c1 == 'm') return "cm"
      else if (c0 == 'g' && c1 == 's') return "gs"
      else if (c0 == 'D' && c1 == 'o') return "Do"
      else if (c0 == 'r' && c1 == 'e') return "re"
    } else if (len == 3) {
      if (kwEq(start, 3, "obj")) return "obj"
    } else if (len == 4) {
      if (c0 == 't' && kwEq(start, 4, "true")) return "true"
      if (c0 == 'n' && kwEq(start, 4, "null")) return "null"
      if (c0 == 'x' && kwEq(start, 4, "xref")) return "xref"
    } else if (len == 5) {
      if (kwEq(start, 5, "false")) return "false"
    } else if (len == 6) {
      if (c0 == 'e' && kwEq(start, 6, "endobj")) return "endobj"
      if (c0 == 's' && kwEq(start, 6, "stream")) return "stream"
    } else if (len == 7) {
      if (kwEq(start, 7, "trailer")) return "trailer"
    } else if (len == 9) {
      if (c0 == 'e' && kwEq(start, 9, "endstream")) return "endstream"
      if (c0 == 's' && kwEq(start, 9, "startxref")) return "startxref"
    }
    new String(buf, start, len, java.nio.charset.StandardCharsets.US_ASCII)
  }

  def peekKeyword(): String = { val p = pos; val k = readKeyword(); pos = p; k }

  /** True and consumed if the next token is exactly `kw`. */
  def tryKeyword(kw: String): Boolean = {
    val p = pos
    if (readKeyword() == kw) true else { pos = p; false }
  }

  /** Parse one object. Handles `num gen R` lookahead for indirect refs. */
  def parseObject(depth: Int = 0): PObj = {
    if (depth > 64) throw new PdfParseException("object nesting too deep")
    skipWs()
    val c = at(pos)
    c match {
      case -1  => throw new PdfParseException("unexpected EOF")
      case '/' => parseName()
      case '(' => parseLiteralString()
      case '[' =>
        pos += 1
        val items = new ArrayBuffer[PObj]()
        skipWs()
        while (at(pos) != ']') {
          if (eof) throw new PdfParseException("unterminated array")
          items += parseObject(depth + 1)
          skipWs()
        }
        pos += 1
        PArr(items.toVector)
      case '<' =>
        if (at(pos + 1) == '<') parseDict(depth)
        else parseHexString()
      case d if d == '+' || d == '-' || d == '.' || (d >= '0' && d <= '9') =>
        parseNumberOrRef()
      case _ =>
        readKeyword() match {
          case "true"  => PBool(true)
          case "false" => PBool(false)
          case "null"  => PNull
          case k       => throw new PdfParseException(s"unexpected token '$k' at $pos")
        }
    }
  }

  def parseDict(depth: Int = 0): PDict = {
    skipWs()
    if (!(at(pos) == '<' && at(pos + 1) == '<')) throw new PdfParseException("expected <<")
    pos += 2
    val m = Map.newBuilder[String, PObj]
    skipWs()
    while (!(at(pos) == '>' && at(pos + 1) == '>')) {
      if (eof) throw new PdfParseException("unterminated dict")
      val key = parseName().s
      val v = parseObject(depth + 1)
      m += key -> v
      skipWs()
    }
    pos += 2
    PDict(m.result())
  }

  def parseName(): PName = {
    skipWs()
    if (at(pos) != '/') throw new PdfParseException("expected name")
    pos += 1
    val sb = new StringBuilder
    while (pos < buf.length && !isWs(at(pos)) && !isDelim(at(pos))) {
      val c = at(pos)
      if (c == '#' && pos + 2 < buf.length) {
        val hex = Integer.parseInt(new String(buf, pos + 1, 2, java.nio.charset.StandardCharsets.US_ASCII), 16)
        sb.append(hex.toChar); pos += 3
      } else { sb.append(c.toChar); pos += 1 }
    }
    PName(sb.toString)
  }

  private def parseLiteralString(): PStr = {
    pos += 1 // '('
    val out = new java.io.ByteArrayOutputStream()
    var depth = 1
    while (depth > 0) {
      if (eof) throw new PdfParseException("unterminated string")
      val c = at(pos); pos += 1
      c match {
        case '(' => depth += 1; out.write('(')
        case ')' => depth -= 1; if (depth > 0) out.write(')')
        case '\\' =>
          val e = at(pos); pos += 1
          e match {
            case 'n' => out.write('\n')
            case 'r' => out.write('\r')
            case 't' => out.write('\t')
            case 'b' => out.write('\b')
            case 'f' => out.write('\f')
            case '(' => out.write('(')
            case ')' => out.write(')')
            case '\\' => out.write('\\')
            case '\r' => if (at(pos) == '\n') pos += 1 // line continuation
            case '\n' => // line continuation
            case d if d >= '0' && d <= '7' =>
              var v = d - '0'; var k = 0
              while (k < 2 && at(pos) >= '0' && at(pos) <= '7') { v = v * 8 + (at(pos) - '0'); pos += 1; k += 1 }
              out.write(v & 0xff)
            case -1 => throw new PdfParseException("unterminated escape")
            case other => out.write(other)
          }
        case _ => out.write(c)
      }
    }
    PStr(out.toByteArray)
  }

  private def parseHexString(): PStr = {
    pos += 1 // '<'
    val out = new java.io.ByteArrayOutputStream()
    var hi = -1
    while (at(pos) != '>') {
      if (eof) throw new PdfParseException("unterminated hex string")
      val c = at(pos); pos += 1
      val v = Character.digit(c, 16)
      if (v >= 0) {
        if (hi < 0) hi = v else { out.write(hi * 16 + v); hi = -1 }
      }
    }
    pos += 1
    if (hi >= 0) out.write(hi * 16) // odd digit → pad 0
    PStr(out.toByteArray)
  }

  private def parseNumberOrRef(): PObj = {
    val n1 = parseNumber()
    if (n1.d == math.floor(n1.d) && n1.d >= 0) {
      val save = pos
      skipWs()
      val c = at(pos)
      if (c >= '0' && c <= '9') {
        val n2 = parseNumber()
        val save2 = pos
        skipWs()
        if (at(pos) == 'R' && (isWs(at(pos + 1)) || isDelim(at(pos + 1)) || pos + 1 >= buf.length)) {
          pos += 1
          return PRef(n1.toInt, n2.toInt)
        }
        pos = save2
        pos = save // rewind fully; n2 belongs to the enclosing context
      } else pos = save
    }
    n1
  }

  def parseNumber(): PNum = {
    skipWs()
    val start = pos
    var neg = false
    if (at(pos) == '+') pos += 1
    else if (at(pos) == '-') { neg = true; pos += 1 }
    // integer fast path (coordinates/offsets are overwhelmingly integers):
    // exact long accumulation, no substring/parseDouble allocation
    var intVal = 0L
    var nDigits = 0
    while (at(pos) >= '0' && at(pos) <= '9' && nDigits < 18) {
      intVal = intVal * 10 + (at(pos) - '0')
      nDigits += 1
      pos += 1
    }
    val afterInt = at(pos)
    if (nDigits > 0 && nDigits < 18 && afterInt != '.' && !(afterInt >= '0' && afterInt <= '9'))
      return PNum(if (neg) -intVal.toDouble else intVal.toDouble)
    // general path: fractions / very long numerals via parseDouble for
    // correctly-rounded decimal→binary conversion
    while (pos < buf.length && ((at(pos) >= '0' && at(pos) <= '9') || at(pos) == '.')) pos += 1
    if (pos == start) throw new PdfParseException(s"expected number at $pos")
    val s = new String(buf, start, pos - start, java.nio.charset.StandardCharsets.US_ASCII)
    PNum(java.lang.Double.parseDouble(if (s == "-" || s == "+" || s == ".") "0" else s))
  }
}
