package graft.extract.pdf

import scala.collection.mutable.ArrayBuffer

/** Content-stream interpreter + reading-order text assembly.
  *
  * Re-expresses the reference's two-layer behavior — PyMuPDF `get_text("text")`
  * per page joined with "\n" (reference: src/services/RAG/ocr_engine.py:221-228)
  * and the OCR reading-order sort by coarse grid
  * `(round(cy/16), round(cx/16))` (convert_to_embeddings.py:271-277) — as one
  * deterministic pass over positioned text runs.
  *
  * FROZEN constants (byte-identity contract, SURVEY.md §7.4):
  *   - grid quantization: 16 units in both axes
  *   - TJ kerning: a number adjustment <= -180 inserts exactly one space
  *   - runs on the same grid line joined with a single space
  *   - lines joined "\n", pages joined "\n"
  *   - two-column splitting iff some runs start at x<200, some at x>=290,
  *     and none start in [200,290)
  */
object PdfText {

  final case class Run(x: Double, y: Double, seq: Int, text: String)

  // 2D affine matrix [a b c d e f]; PDF row-vector convention p' = p·M
  private type Mat = Array[Double]
  private def identity: Mat = Array(1, 0, 0, 1, 0, 0)
  private def mul(m: Mat, n: Mat): Mat = Array(
    m(0) * n(0) + m(1) * n(2),
    m(0) * n(1) + m(1) * n(3),
    m(2) * n(0) + m(3) * n(2),
    m(2) * n(1) + m(3) * n(3),
    m(4) * n(0) + m(5) * n(2) + n(4),
    m(4) * n(1) + m(5) * n(3) + n(5))
  private def translate(tx: Double, ty: Double): Mat = Array(1, 0, 0, 1, tx, ty)

  /** Interpret one page's content stream into positioned text runs. */
  def runs(content: Array[Byte]): Vector[Run] = {
    val out = new ArrayBuffer[Run]()
    val lx = new PdfLexer(content, 0)
    val stack = new ArrayBuffer[PObj]()
    var ctm: Mat = identity
    val gsStack = new ArrayBuffer[Mat]()
    var tm: Mat = identity
    var lm: Mat = identity
    var leading = 0.0
    var seq = 0

    // direct indexed access — lift/collect would allocate Option+PF per call,
    // and operators call this up to 6 times each
    def num(i: Int): Double = {
      val idx = stack.length - i
      if (idx >= 0 && idx < stack.length) stack(idx) match {
        case PNum(d) => d
        case _ => 0.0
      } else 0.0
    }

    def lastStr(): PStr = {
      if (stack.isEmpty) null
      else stack(stack.length - 1) match { case s: PStr => s; case _ => null }
    }

    def emit(text: String): Unit = {
      if (text.nonEmpty) {
        val trm = mul(tm, ctm)
        out += Run(trm(4), trm(5), seq, text)
        seq += 1
      }
    }

    def nextLine(tx: Double, ty: Double): Unit = { lm = mul(translate(tx, ty), lm); tm = lm.clone() }

    while (!lx.eof) {
      lx.skipWs()
      if (!lx.eof) {
        val c = content(lx.pos) & 0xff
        val isOperand =
          c == '/' || c == '(' || c == '<' || c == '[' ||
          c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9')
        if (isOperand) {
          try stack += lx.parseObject()
          catch { case _: PdfParseException => lx.pos += 1 }
        } else {
          val op = lx.readKeyword()
          op match {
            case "q" => gsStack += ctm.clone()
            case "Q" => if (gsStack.nonEmpty) { ctm = gsStack.remove(gsStack.length - 1) }
            case "cm" =>
              val m = Array(num(6), num(5), num(4), num(3), num(2), num(1))
              ctm = mul(m, ctm)
            case "BT" => tm = identity; lm = identity
            case "ET" =>
            case "Tf" => // font size = top operand; font name ignored
            case "TL" => leading = num(1)
            case "Td" => nextLine(num(2), num(1))
            case "TD" => leading = -num(1); nextLine(num(2), num(1))
            case "Tm" =>
              lm = Array(num(6), num(5), num(4), num(3), num(2), num(1))
              tm = lm.clone()
            case "T*" => nextLine(0, -leading)
            case "Tj" =>
              val s = lastStr(); if (s != null) emit(s.text)
            case "'" =>
              nextLine(0, -leading)
              val s = lastStr(); if (s != null) emit(s.text)
            case "\"" =>
              nextLine(0, -leading)
              val s = lastStr(); if (s != null) emit(s.text)
            case "TJ" =>
              if (stack.nonEmpty) stack(stack.length - 1) match {
                case PArr(items) =>
                  val sb = new StringBuilder
                  items.foreach {
                    case s: PStr => sb.append(s.text)
                    case PNum(d) => if (d <= -180) sb.append(' ')
                    case _ =>
                  }
                  emit(sb.toString)
                case _ =>
              }
            case "BI" =>
              // inline image: skip to "EI" delimited by whitespace
              var p = lx.pos
              var found = false
              while (!found && p < content.length - 2) {
                if ((content(p) & 0xff) == 'E' && (content(p + 1) & 0xff) == 'I' &&
                    (p + 2 >= content.length || (content(p + 2) & 0xff) <= 32)) {
                  lx.pos = p + 2; found = true
                } else p += 1
              }
              if (!found) lx.pos = content.length
            case "" => lx.pos += 1 // stray delimiter byte; never stall
            case _ => // unhandled operator: operands already on stack
          }
          if (op.nonEmpty) stack.clear()
        }
      }
    }
    out.toVector
  }

  /** Assemble runs of one page into reading-order text. */
  def assemble(pageRuns: Vector[Run]): String = {
    if (pageRuns.isEmpty) return ""
    val hasLeft = pageRuns.exists(_.x < 200)
    val hasRight = pageRuns.exists(_.x >= 290)
    val hasMid = pageRuns.exists(r => r.x >= 200 && r.x < 290)
    val groups: Vector[Vector[Run]] =
      if (hasLeft && hasRight && !hasMid)
        Vector(pageRuns.filter(_.x < 200), pageRuns.filter(_.x >= 290))
      else Vector(pageRuns)

    groups.filter(_.nonEmpty).map { g =>
      val sorted = g.sortBy(r => (-math.round(r.y / 16.0), math.round(r.x / 16.0), r.seq))
      val sb = new StringBuilder
      var curLine = Long.MinValue
      var lineHasText = false
      sorted.foreach { r =>
        val yb = -math.round(r.y / 16.0)
        val t = r.text.trim
        if (t.nonEmpty) {
          if (curLine == Long.MinValue) { sb.append(t); lineHasText = true }
          else if (yb == curLine) { if (lineHasText) sb.append(' '); sb.append(t); lineHasText = true }
          else { sb.append('\n'); sb.append(t); lineHasText = true }
        }
        if (curLine == Long.MinValue || yb != curLine) curLine = yb
      }
      sb.toString
    }.filter(_.nonEmpty).mkString("\n")
  }

  /** Full document: pages joined with "\n"
    * (reference: src/services/RAG/ocr_engine.py:228). */
  def extract(doc: PdfDoc): (String, Vector[(Int, Int)]) = {
    val pages = doc.pageContents()
    val sb = new StringBuilder
    val spans = Vector.newBuilder[(Int, Int)]
    pages.foreach { content =>
      val text = assemble(runs(content))
      if (text.nonEmpty) {
        if (sb.nonEmpty) sb.append('\n')
        val start = sb.length
        sb.append(text)
        spans += ((start, sb.length))
      }
    }
    (sb.toString, spans.result())
  }
}
