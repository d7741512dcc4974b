package graft.corpus

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.ISO_8859_1
import java.util.zip.Deflater

/** Deterministic minimal PDF writer for the synthetic corpus
  * (FIXTURES.md §1: single-xref Flate PDFs with Tj/TJ/Td/Tm ops, plus an
  * object-stream + xref-stream variant and a two-column variant).
  *
  * Replaces the reference's filesystem corpus of real PDFs (it ships none —
  * SURVEY.md §5); the generator + parser pair gives a closed roundtrip
  * contract: text in == text extracted.
  */
object PdfGen {

  private def esc(s: String): String =
    s.flatMap {
      case '('  => "\\("
      case ')'  => "\\)"
      case '\\' => "\\\\"
      case c    => c.toString
    }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION)
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream(math.max(64, data.length / 2))
    val chunk = new Array[Byte](8192)
    while (!d.finished()) out.write(chunk, 0, d.deflate(chunk))
    d.end()
    out.toByteArray
  }

  /** Content stream for one page of text lines starting at (72, 720),
    * 14pt leading, one Tj per line. Every 7th line uses a TJ array with a
    * kerning split (adjustment -250 → renders as the line's space). */
  private def pageContent(lines: Seq[String], xStart: Int = 72): Array[Byte] = {
    val sb = new StringBuilder
    sb.append(s"BT\n/F1 12 Tf\n18 TL\n$xStart 720 Td\n")
    lines.zipWithIndex.foreach { case (line, i) =>
      if (i > 0) sb.append("T*\n")
      if (i % 7 == 6 && line.contains(' ')) {
        val cut = line.indexOf(' ')
        sb.append(s"[(${esc(line.substring(0, cut))}) -250 (${esc(line.substring(cut + 1))})] TJ\n")
      } else {
        sb.append(s"(${esc(line)}) Tj\n")
      }
    }
    sb.append("ET\n")
    sb.toString.getBytes(ISO_8859_1)
  }

  /** Two-column page: left column at x=72, right column at x=300 (the
    * parser's frozen column-split heuristic: x<200 vs x>=290). */
  private def twoColContent(left: Seq[String], right: Seq[String]): Array[Byte] = {
    val sb = new StringBuilder
    def col(x: Int, lines: Seq[String]): Unit = {
      sb.append(s"BT\n/F1 10 Tf\n18 TL\n1 0 0 1 $x 700 Tm\n")
      lines.zipWithIndex.foreach { case (line, i) =>
        if (i > 0) sb.append("T*\n")
        sb.append(s"(${esc(line)}) Tj\n")
      }
      sb.append("ET\n")
    }
    col(72, left)
    col(300, right)
    sb.toString.getBytes(ISO_8859_1)
  }

  /** Wrap text into lines of at most `width` chars at word boundaries. */
  def wrap(text: String, width: Int = 80): Vector[String] = {
    val words = text.split(" ").filter(_.nonEmpty)
    val lines = Vector.newBuilder[String]
    val cur = new StringBuilder
    words.foreach { w =>
      if (cur.isEmpty) cur.append(w)
      else if (cur.length + 1 + w.length <= width) { cur.append(' '); cur.append(w) }
      else { lines += cur.toString; cur.clear(); cur.append(w) }
    }
    if (cur.nonEmpty) lines += cur.toString
    lines.result()
  }

  private val LinesPerPage = 46

  /** Classic PDF: header, catalog, page tree, one Flate content stream per
    * page, classic xref table + trailer. */
  def classic(text: String, compress: Boolean = true): Array[Byte] = {
    val pages = wrap(text).grouped(LinesPerPage).toVector match {
      case Vector() => Vector(Vector(""))
      case v => v
    }
    build(pages.map(p => pageContent(p)), compress)
  }

  /** Two-column PDF: each page's lines split left/right halves. */
  def twoColumn(text: String): Array[Byte] = {
    val lines = wrap(text, 40)
    val perPage = 48
    val pages = lines.grouped(perPage).toVector match {
      case Vector() => Vector(Vector(""))
      case v => v
    }
    build(pages.map { p =>
      val half = (p.length + 1) / 2
      twoColContent(p.take(half), p.drop(half))
    }, compress = true)
  }

  private def build(contents: Vector[Array[Byte]], compress: Boolean): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val offsets = scala.collection.mutable.Map[Int, Int]()
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    def obj(num: Int)(body: => Unit): Unit = {
      offsets(num) = out.size()
      w(s"$num 0 obj\n"); body; w("\nendobj\n")
    }

    val nPages = contents.length
    // object numbering: 1 catalog, 2 pages, 3 font, 4..3+n page objs, 4+n.. content streams
    val pageObj0 = 4
    val contObj0 = 4 + nPages

    w("%PDF-1.4\n%âãÏÓ\n")
    obj(1)(w("<< /Type /Catalog /Pages 2 0 R >>"))
    obj(2) {
      val kids = (0 until nPages).map(i => s"${pageObj0 + i} 0 R").mkString(" ")
      w(s"<< /Type /Pages /Kids [ $kids ] /Count $nPages >>")
    }
    obj(3)(w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"))
    contents.zipWithIndex.foreach { case (_, i) =>
      obj(pageObj0 + i)(w(
        s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        s"/Resources << /Font << /F1 3 0 R >> >> /Contents ${contObj0 + i} 0 R >>"))
    }
    contents.zipWithIndex.foreach { case (content, i) =>
      val data = if (compress) deflate(content) else content
      val filter = if (compress) " /Filter /FlateDecode" else ""
      obj(contObj0 + i) {
        w(s"<< /Length ${data.length}$filter >>\nstream\n")
        out.write(data)
        w("\nendstream")
      }
    }
    val nObjs = contObj0 + nPages
    val xrefOff = out.size()
    w(s"xref\n0 $nObjs\n0000000000 65535 f \n")
    (1 until nObjs).foreach { n => w(f"${offsets(n)}%010d 00000 n \n") }
    w(s"trailer\n<< /Size $nObjs /Root 1 0 R >>\nstartxref\n$xrefOff\n%%EOF\n")
    out.toByteArray
  }

  /** Modern PDF: catalog/pages/font/page dicts packed into an /ObjStm,
    * content streams as regular Flate streams, and an xref *stream*
    * (/Type/XRef, /W [1 4 2]) — exercises type-2 xref entries. */
  def withObjectStreams(text: String): Array[Byte] = {
    val pages = wrap(text).grouped(LinesPerPage).toVector match {
      case Vector() => Vector(Vector(""))
      case v => v
    }
    val contents = pages.map(p => deflate(pageContent(p)))
    val nPages = contents.length
    // numbering: 1 catalog, 2 pages, 3 font, 4..3+n pages; in ObjStm (obj N-1)
    // content streams 4+n .. 3+2n as regular objects; objstm = 4+2n; xref stream = 5+2n
    val pageObj0 = 4
    val contObj0 = 4 + nPages
    val objStmNum = 4 + 2 * nPages
    val xrefNum = objStmNum + 1

    val packed: Vector[(Int, String)] =
      Vector(
        1 -> "<< /Type /Catalog /Pages 2 0 R >>",
        2 -> s"<< /Type /Pages /Kids [ ${(0 until nPages).map(i => s"${pageObj0 + i} 0 R").mkString(" ")} ] /Count $nPages >>",
        3 -> "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>") ++
      (0 until nPages).map { i =>
        (pageObj0 + i) ->
          (s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
           s"/Resources << /Font << /F1 3 0 R >> >> /Contents ${contObj0 + i} 0 R >>")
      }

    // build objstm payload
    val bodies = packed.map(_._2 + "\n")
    val offs = bodies.scanLeft(0)(_ + _.length).init
    val header = packed.zip(offs).map { case ((num, _), off) => s"$num $off" }.mkString(" ") + "\n"
    val stmData = (header + bodies.mkString).getBytes(ISO_8859_1)
    val stmDeflated = deflate(stmData)

    val out = new ByteArrayOutputStream()
    val offsets = scala.collection.mutable.Map[Int, Int]()
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))

    w("%PDF-1.5\n%âãÏÓ\n")
    contents.zipWithIndex.foreach { case (data, i) =>
      val num = contObj0 + i
      offsets(num) = out.size()
      w(s"$num 0 obj\n<< /Length ${data.length} /Filter /FlateDecode >>\nstream\n")
      out.write(data)
      w("\nendstream\nendobj\n")
    }
    offsets(objStmNum) = out.size()
    w(s"$objStmNum 0 obj\n<< /Type /ObjStm /N ${packed.length} /First ${header.length} " +
      s"/Length ${stmDeflated.length} /Filter /FlateDecode >>\nstream\n")
    out.write(stmDeflated)
    w("\nendstream\nendobj\n")

    // xref stream: entries for objects 0..xrefNum
    val xrefOff = out.size()
    val rows = new ByteArrayOutputStream()
    def row(t: Int, f2: Long, f3: Int): Unit = {
      rows.write(t)
      rows.write(((f2 >> 24) & 0xff).toInt); rows.write(((f2 >> 16) & 0xff).toInt)
      rows.write(((f2 >> 8) & 0xff).toInt); rows.write((f2 & 0xff).toInt)
      rows.write((f3 >> 8) & 0xff); rows.write(f3 & 0xff)
    }
    row(0, 0, 0xffff) // obj 0: free
    packed.zipWithIndex.foreach { case ((num, _), idx) => row(2, objStmNum.toLong, idx) }
    // NB: packed covers 1..3+nPages contiguously, so rows align with obj nums
    (0 until nPages).foreach { i => row(1, offsets(contObj0 + i).toLong, 0) }
    row(1, offsets(objStmNum).toLong, 0)
    row(1, xrefOff.toLong, 0)
    val rowData = deflate(rows.toByteArray)
    w(s"$xrefNum 0 obj\n<< /Type /XRef /Size ${xrefNum + 1} /W [1 4 2] /Index [0 ${xrefNum + 1}] " +
      s"/Root 1 0 R /Length ${rowData.length} /Filter /FlateDecode >>\nstream\n")
    out.write(rowData)
    w("\nendstream\nendobj\n")
    w(s"startxref\n$xrefOff\n%%EOF\n")
    out.toByteArray
  }
}
