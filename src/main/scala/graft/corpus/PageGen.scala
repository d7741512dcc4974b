package graft.corpus

import java.sql.Timestamp
import graft.PageRow

/** Deterministic generator of the north-rule input table
  * (`BASELINE.json:input_hint`): Common-Crawl-style pages
  * `(url, warc_ts, html BINARY, text, lang)`.
  *
  * Seeded (splitmix64 over the row index) — same seed + index → same row on
  * any JVM, which is what makes golden fixtures and the local[8]-vs-local[32]
  * scaling comparison apples-to-apples (SURVEY.md §7.4).
  *
  * Row mix per FIXTURES.md §1: 55% HTML article, 10% link farm, 10% noisy
  * HTML, 15% classic PDF, 5% objstm/two-column PDF, 3% exact duplicates,
  * 2% near duplicates, plus sniffer-garbage rows.
  */
object PageGen {

  private val Words: Array[String] =
    ("the quick analysis shows that convergence of the iterative scheme depends on " +
     "initial guess and derivative magnitude while stability requires bounded error " +
     "terms across each step moreover sampling theory gives variance estimates for " +
     "large corpora where token frequency follows a power law distribution and " +
     "document length varies widely between short notes and long technical reports " +
     "finally evaluation uses held out pages to measure extraction precision recall " +
     "and throughput under load with skewed partitions salted to balance work")
      .split(" ")

  /** Pinned passage so retrieval fixtures have a known answer (mirrors the
    * reference's Newton-Raphson demo corpus,
    * src/services/QuestionGen/question_rag.py:223-739). */
  val NewtonPassage: String =
    "The Newton Raphson method finds successively better approximations to the " +
    "roots of a real valued function. The method starts with a function f and its " +
    "derivative f prime and an initial guess x0 for a root. If the function is well " +
    "behaved the iteration x1 equals x0 minus f of x0 over f prime of x0 converges " +
    "quadratically to the root. The Newton Raphson iteration is widely used in " +
    "numerical analysis for solving nonlinear equations."

  import graft.Hashing.mix64

  private def rand(seed: Long, idx: Long, slot: Long): Long =
    mix64(seed * 0x9e3779b97f4a7c15L + idx * 0xc2b2ae3d27d4eb4fL + slot)

  private def word(seed: Long, idx: Long, k: Int): String =
    Words(((rand(seed, idx, 1000 + k) >>> 8) % Words.length).toInt)

  /** n words of seeded prose. */
  def prose(seed: Long, idx: Long, n: Int, salt: Int = 0): String = {
    val sb = new StringBuilder
    var k = 0
    while (k < n) {
      if (k > 0) sb.append(' ')
      sb.append(word(seed, idx, salt * 100000 + k))
      k += 1
    }
    sb.toString
  }

  private def paragraphs(seed: Long, idx: Long, nPara: Int): Vector[String] =
    (0 until nPara).map { p =>
      val n = 20 + ((rand(seed, idx, 2000 + p) >>> 8) % 60).toInt
      prose(seed, idx, n, salt = p + 1)
    }.toVector

  /** The archetype a given row index belongs to (stable across scales). */
  def archetype(seed: Long, idx: Long): String = {
    val r = ((rand(seed, idx, 1) >>> 8) % 100).toInt
    if (r < 55) "article"
    else if (r < 65) "linkfarm"
    else if (r < 75) "noisy"
    else if (r < 90) "pdf"
    else if (r < 93) "pdf2"      // objstm / two-column
    else if (r < 96) "dup"       // exact duplicate of an earlier row
    else if (r < 98) "neardup"   // near duplicate of an earlier article
    else "garbage"
  }

  /** Expected main-text of a row, for golden assertions (None when the row
    * has no deterministic closed-form expectation, e.g. linkfarm/garbage). */
  def expectedText(seed: Long, idx: Long): Option[String] = archetype(seed, idx) match {
    case "article" => Some(articleParas(seed, idx).mkString("\n\n"))
    case "pdf"     => Some(PdfGen.wrap(pdfText(seed, idx)).grouped(46).map(_.mkString("\n")).mkString("\n"))
    case _         => None
  }

  private def articleParas(seed: Long, idx: Long): Vector[String] = {
    val nPara = 5 + ((rand(seed, idx, 3) >>> 8) % 36).toInt
    val base = paragraphs(seed, idx, nPara)
    // ~1 in 16 articles carries the pinned retrieval passage
    if ((rand(seed, idx, 4) >>> 8) % 16 == 0) NewtonPassage +: base else base
  }

  private def pdfText(seed: Long, idx: Long): String = {
    val n = 200 + ((rand(seed, idx, 5) >>> 8) % 2000).toInt
    prose(seed, idx, n, salt = 7)
  }

  def url(idx: Long): String = {
    val host = (idx % 97).toInt
    f"https://host$host%d.example/p/${idx}%08d"
  }

  private def ts(seed: Long, idx: Long): Timestamp =
    new Timestamp(1704067200000L + (rand(seed, idx, 6) >>> 8) % (365L * 24 * 3600 * 1000))

  /** Generate one row. Pure function of (seed, idx). */
  def row(seed: Long, idx: Long): PageRow = {
    val host = (idx % 97).toInt
    val kind = archetype(seed, idx)
    val related = (0 until 6).map(k => prose(seed, idx, 3, salt = 50 + k))
    val bytes: Array[Byte] = kind match {
      case "article" =>
        HtmlGen.article(s"Article $idx", articleParas(seed, idx), host, related)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      case "linkfarm" =>
        HtmlGen.linkFarm(host, (0 until 40).map(k => prose(seed, idx, 2, salt = 60 + k)))
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      case "noisy" =>
        HtmlGen.noisy(s"Noisy $idx", (0 until 12).map(k => prose(seed, idx, 12, salt = 70 + k)), host)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      case "pdf" => PdfGen.classic(pdfText(seed, idx))
      case "pdf2" =>
        if (idx % 2 == 0) PdfGen.withObjectStreams(pdfText(seed, idx))
        else PdfGen.twoColumn(pdfText(seed, idx))
      case "dup" =>
        // byte-identical copy of an earlier article row under a new url
        val src = srcIdx(seed, idx)
        HtmlGen.article(s"Article $src", articleParas(seed, src), (src % 97).toInt,
          (0 until 6).map(k => prose(seed, src, 3, salt = 50 + k)))
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      case "neardup" =>
        // same paragraphs as an earlier article with one sentence appended
        val src = srcIdx(seed, idx)
        val paras = articleParas(seed, src) :+ prose(seed, idx, 12, salt = 99)
        HtmlGen.article(s"Article $src", paras, host, related)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      case _ => // garbage: random bytes, sniffed as unknown
        val n = 64 + ((rand(seed, idx, 7) >>> 8) % 512).toInt
        val b = new Array[Byte](n)
        var k = 0
        while (k < n) { b(k) = (rand(seed, idx, 8000 + k) >>> 16).toByte; k += 1 }
        b
    }
    PageRow(url(idx), ts(seed, idx), bytes, null, "en")
  }

  /** Deterministic earlier article index a dup/neardup row copies. */
  def srcIdx(seed: Long, idx: Long): Long = {
    if (idx == 0) return 0
    var probe = (rand(seed, idx, 9) >>> 8) % idx
    var guard = 0
    while (archetype(seed, probe) != "article" && guard < 64) {
      probe = (probe + 1) % math.max(idx, 1)
      guard += 1
    }
    if (archetype(seed, probe) == "article") probe else 0
  }
}
