package graft.extract.pdf

import java.util.zip.Inflater
import scala.collection.mutable

/** Cross-reference resolution + object store for one PDF document.
  *
  * Supports: classic `xref` tables with /Prev chains, xref streams
  * (/Type/XRef, /W, /Index, PNG predictors), object streams (/Type/ObjStm),
  * FlateDecode and ASCIIHexDecode filters. Everything else raises
  * [[PdfParseException]], which the extraction stage converts into an `err`
  * row (reference discipline: skip-with-reason,
  * src/services/RAG/convert_to_embeddings.py:357-365).
  */
final class PdfDoc(buf: Array[Byte]) {

  /** objNum → Left(byteOffset) | Right((objStmNum, indexInStream)) */
  private val xref = mutable.Map.empty[Int, Either[Long, (Int, Int)]]
  private val cache = mutable.Map.empty[Int, PObj]
  private val objStmCache = mutable.Map.empty[Int, Map[Int, PObj]]
  var trailer: PDict = PDict(Map.empty)

  loadXref()

  // ------------------------------------------------------------------- xref

  private def loadXref(): Unit = {
    val tailStart = math.max(0, buf.length - 2048)
    val tail = new String(buf, tailStart, buf.length - tailStart, java.nio.charset.StandardCharsets.ISO_8859_1)
    val i = tail.lastIndexOf("startxref")
    if (i < 0) throw new PdfParseException("no startxref")
    val lx = new PdfLexer(buf, tailStart + i + "startxref".length)
    var offset = lx.parseNumber().toLong
    var guard = 0
    val seen = mutable.Set.empty[Long]
    while (offset > 0 && guard < 64 && !seen.contains(offset)) {
      seen += offset
      offset = loadXrefSection(offset)
      guard += 1
    }
    if (xref.isEmpty) throw new PdfParseException("empty xref")
  }

  /** Parse one xref section at `offset`; returns /Prev offset or -1. */
  private def loadXrefSection(offset: Long): Long = {
    if (offset < 0 || offset >= buf.length) throw new PdfParseException(s"xref offset $offset out of range")
    val lx = new PdfLexer(buf, offset.toInt)
    if (lx.tryKeyword("xref")) {
      // classic table: subsections until the trailer keyword
      while (true) {
        lx.skipWs()
        if (lx.tryKeyword("trailer")) {
          val t = lx.parseDict()
          mergeTrailer(t)
          // hybrid-reference files: classic trailer points at a parallel
          // xref STREAM via /XRefStm (ISO 32000-1 §7.5.8.4) — load it too,
          // classic entries keep precedence (already inserted first)
          t.get("XRefStm").foreach { case PNum(d) => loadXrefSection(d.toLong); case _ => }
          return t.get("Prev").map { case PNum(d) => d.toLong; case _ => -1L }.getOrElse(-1L)
        }
        val next = lx.peekKeyword()
        if (next.isEmpty || !next.forall(_.isDigit)) return -1L
        val start = lx.parseNumber().toInt
        val count = lx.parseNumber().toInt
        var k = 0
        while (k < count) {
          val off = lx.parseNumber().toLong
          lx.parseNumber() // generation
          val kind = lx.readKeyword()
          val num = start + k
          if (kind == "n" && !xref.contains(num)) xref(num) = Left(off)
          k += 1
        }
      }
      -1L
    } else {
      // xref stream: "N G obj << ... >> stream"
      val (_, obj) = parseIndirectAt(offset.toInt)
      obj match {
        case st @ PStream(dict, _) =>
          if (!dict.get("Type").contains(PName("XRef"))) throw new PdfParseException("expected /Type/XRef")
          val data = decodeStream(st)
          val w = dict.get("W") match {
            case Some(PArr(items)) => items.map { case PNum(d) => d.toInt; case _ => 0 }
            case _ => throw new PdfParseException("xref stream missing /W")
          }
          val size = dict.get("Size") match { case Some(PNum(d)) => d.toInt; case _ => 0 }
          val index: Vector[(Int, Int)] = dict.get("Index") match {
            case Some(PArr(items)) =>
              items.grouped(2).collect { case Vector(PNum(a), PNum(b)) => (a.toInt, b.toInt) }.toVector
            case _ => Vector((0, size))
          }
          val rowLen = w.sum
          var p = 0
          index.foreach { case (start, count) =>
            var k = 0
            while (k < count && p + rowLen <= data.length) {
              var f = 0; var fi = 0
              val fields = new Array[Long](w.length)
              while (fi < w.length) {
                var v = 0L; var b = 0
                while (b < w(fi)) { v = (v << 8) | (data(p) & 0xffL); p += 1; b += 1 }
                fields(fi) = v; fi += 1
              }
              f = if (w(0) == 0) 1 else fields(0).toInt
              val num = start + k
              if (!xref.contains(num)) {
                f match {
                  case 1 => xref(num) = Left(fields(1))
                  case 2 => xref(num) = Right((fields(1).toInt, fields(2).toInt))
                  case _ => // free
                }
              }
              k += 1
            }
          }
          mergeTrailer(dict)
          dict.get("Prev") match { case Some(PNum(d)) => d.toLong; case _ => -1L }
        case _ => throw new PdfParseException("bad xref stream object")
      }
    }
  }

  private def mergeTrailer(t: PDict): Unit =
    trailer = PDict(t.m ++ trailer.m) // earlier (newest) sections win

  // ---------------------------------------------------------------- objects

  /** Parse "N G obj <object> [stream]" at a byte offset. */
  private def parseIndirectAt(off: Int): (Int, PObj) = {
    val lx = new PdfLexer(buf, off)
    val num = lx.parseNumber().toInt
    lx.parseNumber() // gen
    if (!lx.tryKeyword("obj")) throw new PdfParseException(s"expected obj at $off")
    val o = lx.parseObject()
    lx.skipWs()
    val out = o match {
      case d: PDict if lx.tryKeyword("stream") =>
        // EOL after 'stream': CRLF or LF
        if (lx.pos < buf.length && buf(lx.pos) == '\r') lx.pos += 1
        if (lx.pos < buf.length && buf(lx.pos) == '\n') lx.pos += 1
        val len = resolve(d.get("Length").getOrElse(PNull)) match {
          case PNum(v) => v.toInt
          case _ => -1
        }
        val start = lx.pos
        val end =
          if (len >= 0 && start + len <= buf.length) start + len
          else { // salvage: scan for endstream
            val idx = indexOf(buf, "endstream".getBytes, start)
            if (idx < 0) throw new PdfParseException("unterminated stream") else idx
          }
        PStream(d, java.util.Arrays.copyOfRange(buf, start, end))
      case other => other
    }
    (num, out)
  }

  private def indexOf(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    while (i <= hay.length - needle.length) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  def fetch(num: Int): PObj = cache.getOrElseUpdate(num, {
    xref.get(num) match {
      case Some(Left(off)) =>
        val (n, o) = parseIndirectAt(off.toInt)
        if (n != num) throw new PdfParseException(s"xref points $num to object $n")
        o
      case Some(Right((stmNum, idx))) =>
        val objs = objStmCache.getOrElseUpdate(stmNum, loadObjStm(stmNum))
        objs.getOrElse(num, throw new PdfParseException(s"object $num not in ObjStm $stmNum"))
      case None => PNull
    }
  })

  /** Decode an object stream (/Type/ObjStm): header of N (objnum, offset)
    * pairs, then the objects themselves (ISO 32000-1 §7.5.7). */
  private def loadObjStm(stmNum: Int): Map[Int, PObj] = {
    fetch(stmNum) match {
      case st @ PStream(dict, _) =>
        val data = decodeStream(st)
        val n = resolve(dict.get("N").getOrElse(PNull)) match { case PNum(v) => v.toInt; case _ => 0 }
        val first = resolve(dict.get("First").getOrElse(PNull)) match { case PNum(v) => v.toInt; case _ => 0 }
        val lx = new PdfLexer(data, 0)
        val header = (0 until n).map { _ => (lx.parseNumber().toInt, lx.parseNumber().toInt) }
        header.map { case (objNum, off) =>
          val olx = new PdfLexer(data, first + off)
          objNum -> olx.parseObject()
        }.toMap
      case _ => throw new PdfParseException(s"ObjStm $stmNum is not a stream")
    }
  }

  def resolve(o: PObj, depth: Int = 0): PObj = o match {
    case PRef(num, _) if depth < 32 => resolve(fetch(num), depth + 1)
    case PRef(_, _) => throw new PdfParseException("reference cycle")
    case other => other
  }

  // ---------------------------------------------------------------- streams

  def decodeStream(st: PStream): Array[Byte] = {
    val filters: Vector[String] = resolve(st.dict.get("Filter").getOrElse(PNull)) match {
      case PName(s) => Vector(s)
      case PArr(items) => items.map { case PName(s) => s; case o => resolve(o) match { case PName(s) => s; case _ => "?" } }
      case PNull => Vector.empty
      case _ => throw new PdfParseException("bad /Filter")
    }
    val parms: Vector[PObj] = resolve(st.dict.get("DecodeParms").getOrElse(PNull)) match {
      case d: PDict => Vector(d)
      case PArr(items) => items
      case _ => Vector.empty
    }
    var data = st.raw
    filters.zipWithIndex.foreach { case (f, i) =>
      val parm = resolve(parms.lift(i).getOrElse(PNull)) match { case d: PDict => d; case _ => PDict(Map.empty) }
      data = f match {
        case "FlateDecode" | "Fl" => predictor(inflate(data), parm)
        case "ASCIIHexDecode" | "AHx" => asciiHex(data)
        case "ASCII85Decode" | "A85" => ascii85(data)
        case "LZWDecode" | "LZW" => predictor(lzw(data), parm)
        case other => throw new PdfParseException(s"unsupported filter $other")
      }
    }
    data
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(math.max(64, data.length * 4))
    val chunk = new Array[Byte](8192)
    try {
      val maxIter = 1 << 20
      var guard = 0
      while (!inf.finished() && guard < maxIter) {
        val n = inf.inflate(chunk)
        if (n == 0 && inf.needsInput()) guard = maxIter // truncated
        else out.write(chunk, 0, n)
        guard += 1
        if (out.size() > (256 << 20)) throw new PdfParseException("stream too large")
      }
    } catch {
      case e: java.util.zip.DataFormatException => throw new PdfParseException(s"bad deflate: ${e.getMessage}")
    } finally inf.end()
    out.toByteArray
  }

  /** PNG predictors (ISO 32000-1 §7.4.4.4 / RFC 2083) used by xref streams. */
  private def predictor(data: Array[Byte], parm: PDict): Array[Byte] = {
    val pred = resolve(parm.get("Predictor").getOrElse(PNum(1))) match { case PNum(v) => v.toInt; case _ => 1 }
    if (pred < 10) return data
    val colors = resolve(parm.get("Colors").getOrElse(PNum(1))) match { case PNum(v) => v.toInt; case _ => 1 }
    val bpc = resolve(parm.get("BitsPerComponent").getOrElse(PNum(8))) match { case PNum(v) => v.toInt; case _ => 8 }
    val columns = resolve(parm.get("Columns").getOrElse(PNum(1))) match { case PNum(v) => v.toInt; case _ => 1 }
    val bpp = math.max(1, colors * bpc / 8)
    val rowLen = (colors * bpc * columns + 7) / 8
    val rows = data.length / (rowLen + 1)
    val out = new Array[Byte](rows * rowLen)
    val prev = new Array[Byte](rowLen)
    var r = 0
    while (r < rows) {
      val ft = data(r * (rowLen + 1)) & 0xff
      val src = r * (rowLen + 1) + 1
      val dst = r * rowLen
      var i = 0
      while (i < rowLen) {
        val raw = data(src + i) & 0xff
        val left = if (i >= bpp) out(dst + i - bpp) & 0xff else 0
        val up = prev(i) & 0xff
        val upLeft = if (i >= bpp) prev(i - bpp) & 0xff else 0
        val v = ft match {
          case 0 => raw
          case 1 => raw + left
          case 2 => raw + up
          case 3 => raw + ((left + up) / 2)
          case 4 =>
            val p = left + up - upLeft
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - upLeft)
            raw + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else upLeft)
          case _ => raw
        }
        out(dst + i) = (v & 0xff).toByte
        i += 1
      }
      System.arraycopy(out, dst, prev, 0, rowLen)
      r += 1
    }
    out
  }

  private def asciiHex(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var hi = -1
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val c = data(i) & 0xff
      if (c == '>') done = true
      else {
        val v = Character.digit(c, 16)
        if (v >= 0) { if (hi < 0) hi = v else { out.write(hi * 16 + v); hi = -1 } }
      }
      i += 1
    }
    if (hi >= 0) out.write(hi * 16)
    out.toByteArray
  }

  /** ASCII85 (btoa) decode, PDF variant: groups of 5 chars '!'..'u' encode
    * 4 bytes base-85; 'z' = four zero bytes; '~>' terminates
    * (ISO 32000-1 §7.4.3). */
  private def ascii85(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var tuple = 0L
    var count = 0
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val c = data(i) & 0xff
      if (c == '~') done = true
      else if (c == 'z' && count == 0) out.write(Array[Byte](0, 0, 0, 0))
      else if (c >= '!' && c <= 'u') {
        tuple = tuple * 85 + (c - '!')
        count += 1
        if (count == 5) {
          out.write(((tuple >> 24) & 0xff).toInt); out.write(((tuple >> 16) & 0xff).toInt)
          out.write(((tuple >> 8) & 0xff).toInt); out.write((tuple & 0xff).toInt)
          tuple = 0; count = 0
        }
      } // whitespace and other bytes ignored
      i += 1
    }
    if (count > 0) {
      // partial group: pad with 'u' (84), emit count-1 bytes
      var k = count
      while (k < 5) { tuple = tuple * 85 + 84; k += 1 }
      val bytes = Array(((tuple >> 24) & 0xff).toByte, ((tuple >> 16) & 0xff).toByte,
        ((tuple >> 8) & 0xff).toByte, (tuple & 0xff).toByte)
      out.write(bytes, 0, count - 1)
    }
    out.toByteArray
  }

  /** LZW decode, PDF/TIFF variant: 8-bit codes growing 9→12 bits, clear
    * code 256, EOD 257, early code-size change (ISO 32000-1 §7.4.4.2). */
  private def lzw(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val dict = new scala.collection.mutable.ArrayBuffer[Array[Byte]](4096)
    def resetDict(): Unit = {
      dict.clear()
      var i = 0
      while (i < 256) { dict += Array(i.toByte); i += 1 }
      dict += Array.emptyByteArray // 256 clear
      dict += Array.emptyByteArray // 257 EOD
    }
    resetDict()
    var codeBits = 9
    var bitBuf = 0L
    var bitCount = 0
    var prev: Array[Byte] = null
    var i = 0
    var done = false
    while (i < data.length && !done) {
      bitBuf = (bitBuf << 8) | (data(i) & 0xffL)
      bitCount += 8
      i += 1
      while (bitCount >= codeBits && !done) {
        val code = ((bitBuf >> (bitCount - codeBits)) & ((1 << codeBits) - 1)).toInt
        bitCount -= codeBits
        if (code == 256) { resetDict(); codeBits = 9; prev = null }
        else if (code == 257) done = true
        else {
          val entry: Array[Byte] =
            if (code < dict.length) dict(code)
            else if (prev != null) prev :+ prev(0)
            else throw new PdfParseException("bad LZW code")
          out.write(entry)
          if (prev != null) {
            dict += (prev :+ entry(0))
            // early change: size grows when next code would not fit
            if (dict.length + 1 >= (1 << codeBits) && codeBits < 12) codeBits += 1
          }
          prev = entry
        }
      }
    }
    out.toByteArray
  }

  // --------------------------------------------------------------- page tree

  /** Depth-first page walk (ISO 32000-1 §7.7.3); returns decoded, concatenated
    * content-stream bytes per page. */
  def pageContents(maxPages: Int = 10000): Vector[Array[Byte]] = {
    val root = resolve(trailer.get("Root").getOrElse(throw new PdfParseException("no /Root"))) match {
      case d: PDict => d
      case _ => throw new PdfParseException("bad /Root")
    }
    val pagesRoot = resolve(root.get("Pages").getOrElse(throw new PdfParseException("no /Pages")))
    val out = Vector.newBuilder[Array[Byte]]
    var count = 0

    def walk(node: PObj, depth: Int): Unit = {
      if (depth > 64 || count >= maxPages) return
      resolve(node) match {
        case d: PDict =>
          d.get("Type") match {
            case Some(PName("Page")) =>
              count += 1
              out += contentBytes(d)
            case _ =>
              resolve(d.get("Kids").getOrElse(PNull)) match {
                case PArr(kids) => kids.foreach(walk(_, depth + 1))
                case _ => if (d.get("Contents").isDefined) { count += 1; out += contentBytes(d) }
              }
          }
        case _ =>
      }
    }
    walk(pagesRoot, 0)
    out.result()
  }

  private def contentBytes(page: PDict): Array[Byte] = {
    def one(o: PObj): Array[Byte] = resolve(o) match {
      case st: PStream => decodeStream(st)
      case _ => Array.emptyByteArray
    }
    resolve(page.get("Contents").getOrElse(PNull)) match {
      case st: PStream => decodeStream(st)
      case PArr(items) =>
        val parts = items.map(one)
        val total = parts.map(_.length).sum + math.max(0, parts.length - 1)
        val merged = new Array[Byte](total)
        var p = 0
        parts.zipWithIndex.foreach { case (part, i) =>
          if (i > 0) { merged(p) = '\n'; p += 1 }
          System.arraycopy(part, 0, merged, p, part.length); p += part.length
        }
        merged
      case _ => Array.emptyByteArray
    }
  }
}
