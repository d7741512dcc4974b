package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.{PdfGen, PageGen}
import graft.extract.pdf.{PdfDoc, PdfText}
import graft.extract.{Extract, Sniffer}

class PdfRoundtripSpec extends AnyFunSuite {

  private def extract(bytes: Array[Byte]): String = PdfText.extract(new PdfDoc(bytes))._1

  test("classic PDF roundtrips text (lines rejoin to the original)") {
    val text = PageGen.prose(seed = 42, idx = 1, n = 500, salt = 7)
    val pdf = PdfGen.classic(text)
    assert(Sniffer.sniff(pdf) == "pdf")
    val got = extract(pdf)
    assert(got.nonEmpty)
    assert(got.replace('\n', ' ') == text)
    // expected line structure = wrap at 80 chars
    assert(got == PdfGen.wrap(text).mkString("\n"))
  }

  test("uncompressed PDF parses too") {
    val text = PageGen.prose(42, 2, 120, salt = 7)
    val got = extract(PdfGen.classic(text, compress = false))
    assert(got.replace('\n', ' ') == text)
  }

  test("multi-page PDF keeps page order") {
    val text = PageGen.prose(42, 3, 2000, salt = 7) // > 46 lines → multiple pages
    val pdf = PdfGen.classic(text)
    val lines = PdfGen.wrap(text)
    assert(lines.length > 46)
    assert(extract(pdf) == lines.mkString("\n"))
  }

  test("object-stream + xref-stream PDF roundtrips") {
    val text = PageGen.prose(42, 4, 800, salt = 7)
    val pdf = PdfGen.withObjectStreams(text)
    assert(Sniffer.sniff(pdf) == "pdf")
    assert(extract(pdf).replace('\n', ' ') == text)
  }

  test("two-column PDF reads left column fully before right") {
    val text = PageGen.prose(42, 5, 150, salt = 7)
    val pdf = PdfGen.twoColumn(text)
    val got = extract(pdf)
    assert(got.replace('\n', ' ') == text)
  }

  test("TJ kerning adjustment <= -180 renders as a space") {
    val text = ("alpha beta " * 40).trim // forces an i%7==6 TJ line
    val got = extract(PdfGen.classic(text))
    assert(got.replace('\n', ' ') == text)
  }

  test("escaped characters in literal strings survive") {
    val text = "parens (nested (deep)) and backslash \\ mix " + ("pad " * 30).trim
    val got = extract(PdfGen.classic(text))
    assert(got.replace('\n', ' ') == text)
  }

  test("garbage bytes yield err row, not an exception") {
    val junk = Array.tabulate[Byte](300)(i => (i * 31).toByte)
    val doc = Extract.extractOne("u", "%PDF-1.4 then junk".getBytes ++ junk)
    assert(doc.method == "err" || doc.method == "empty_text")
  }

  test("truncated PDF yields err row") {
    val pdf = PdfGen.classic(PageGen.prose(42, 6, 300, salt = 7))
    val doc = Extract.extractOne("u", pdf.take(pdf.length / 2))
    assert(doc.err.nonEmpty || doc.method == "empty_text")
  }

  test("near-empty PDF hits the empty_text gate (eff < 50 chars)") {
    val doc = Extract.extractOne("u", PdfGen.classic("tiny"))
    assert(doc.method == "empty_text")
    assert(doc.text == "")
  }
}
