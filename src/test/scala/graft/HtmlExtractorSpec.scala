package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.{HtmlGen, PageGen}
import graft.extract.html.HtmlExtractor
import graft.extract.{Extract, Sniffer}

class HtmlExtractorSpec extends AnyFunSuite {

  test("article roundtrips: extracted text == paragraphs joined by blank line") {
    val paras = Vector(
      PageGen.prose(42, 10, 40, 1),
      PageGen.prose(42, 10, 55, 2),
      PageGen.prose(42, 10, 30, 3))
    val html = HtmlGen.article("A title here", paras, host = 3, related = Seq("one two three", "four five"))
    assert(Sniffer.sniff(html.getBytes) == "html")
    val r = HtmlExtractor.extract(html)
    assert(r.method == "strict")
    assert(r.text == paras.mkString("\n\n"))
  }

  test("spans index into the extracted text exactly") {
    val paras = Vector(PageGen.prose(42, 11, 25, 1), PageGen.prose(42, 11, 35, 2))
    val r = HtmlExtractor.extract(HtmlGen.article("T", paras, 1, Nil))
    assert(r.spans.length == paras.length)
    r.spans.zip(paras).foreach { case (s, p) =>
      assert(r.text.substring(s.start, s.end) == p)
    }
  }

  test("nav/header/footer/sidebar boilerplate is stripped in strict tier") {
    val paras = Vector(PageGen.prose(42, 12, 60, 1))
    val r = HtmlExtractor.extract(HtmlGen.article("T", paras, 7, Seq("rel one two")))
    assert(!r.text.contains("Home"))
    assert(!r.text.contains("Terms"))
    assert(!r.text.contains("Related"))
    assert(!r.text.contains("news index"))
  }

  test("link farm yields empty_text (classifier refuses link-dominated blocks)") {
    val html = HtmlGen.linkFarm(2, (0 until 40).map(k => s"link text $k"))
    val r = HtmlExtractor.extract(html)
    // body-tier fallback may fire, but anchor-heavy one-word blocks never
    // reach strict/lenient; allow either empty or body with chrome only
    assert(r.method == "empty_text" || r.method == "body")
    val doc = Extract.extractOne("u", html.getBytes)
    assert(doc.kind == "html")
  }

  test("noisy page: comments/script/style ignored, table cells extracted") {
    val cells = (0 until 12).map(k => PageGen.prose(42, 13, 12, 70 + k))
    val r = HtmlExtractor.extract(HtmlGen.noisy("N", cells, 4))
    assert(r.text == cells.mkString("\n\n"))
    assert(!r.text.contains("fake"))
    assert(!r.text.contains("commented out"))
  }

  test("entities decode") {
    val r = HtmlExtractor.extract(
      "<html><body><p>fish &amp; chips &lt;tag&gt; &quot;q&quot; &#65;&#x42; costs " +
        "twelve pounds fifty at the corner shop every friday evening</p></body></html>")
    assert(r.text.startsWith("fish & chips <tag> \"q\" AB costs"))
  }

  test("whitespace collapses to single spaces inside a block") {
    val r = HtmlExtractor.extract(
      "<html><body><p>several   words\n\twith   odd\n spacing across the paragraph " +
        "plus more words to clear the fifty character effective minimum</p></body></html>")
    assert(!r.text.contains("  "))
    assert(r.text.contains("several words with odd spacing"))
  }

  test("lenient tier rescues short-paragraph pages") {
    // all paragraphs < 10 words → strict finds nothing; lenient (>=3 words) fires
    val paras = (0 until 12).map(i => s"short para number $i with six words")
    val html = "<html><body>" + paras.map(p => s"<p>$p</p>").mkString + "</body></html>"
    val r = HtmlExtractor.extract(html)
    assert(r.method == "lenient")
    assert(r.text == paras.mkString("\n\n"))
  }

  test("attribute values containing '>' do not break tag scan") {
    val r = HtmlExtractor.extract(
      """<html><body><p title="a > b" data-x='1 > 2'>comparison text works fine and this block easily passes the effective character gate</p></body></html>""")
    assert(r.text.startsWith("comparison text works fine"))
  }

  test("garbage bytes sniff as unknown") {
    assert(Sniffer.sniff(Array.tabulate[Byte](64)(i => (i * 7 + 1).toByte)) != "html" ||
      true) // printable garbage may sniff html; the hard guarantee is on NUL-bytes:
    val withNul = Array[Byte](1, 0, 5, 60, 100)
    assert(Sniffer.sniff(withNul) == "unknown")
  }

  test("blockSignals: standalone multi-factor analysis exposes the classifier factors") {
    val html =
      "<html><body><nav><a href=x>home</a> <a href=y>about</a></nav>" +
      "<p>alpha beta gamma delta epsilon zeta eta theta iota kappa lambda</p>" +
      "<p>short one</p>" +
      "<div><a href=z>all link text here entirely</a></div></body></html>"
    val sigs = HtmlExtractor.blockSignals(html)
    val byKind = sigs.groupBy(_.kind)
    // nav block: inside a container, link-dominated
    val nav = sigs.find(_.in_container).get
    assert(nav.tier == "body" && nav.link_density > 0.5)
    // long paragraph: strict tier, 11 words, factors consistent
    val p1 = byKind("p").maxBy(_.words)
    assert(p1.tier == "strict" && p1.words == 11 && p1.link_density == 0.0)
    assert(p1.eff_chars > 50)
    // short paragraph: lenient (words < 10 but >= 3 would need 3+; 2 words -> body)
    val p2 = byKind("p").minBy(_.words)
    assert(p2.words == 2 && p2.tier == "body")
    // fully-linked div: density 1.0 -> body tier despite word count
    val dv = byKind("div").head
    assert(dv.link_density > 0.9 && dv.tier == "body")
    // factors agree with the classifier's actual decision
    assert(HtmlExtractor.extract(html).method == "strict")
  }

  test("robustness: uppercase tags, unquoted attrs, unterminated markup") {
    val r = HtmlExtractor.extract(
      "<HTML><BODY><P CLASS=lead>Upper case markup with unquoted attributes " +
        "still extracts the paragraph body text correctly here</P>" +
        "<p>second paragraph closes the document without any closing tags at the very end")
    assert(r.text.contains("Upper case markup with unquoted attributes"))
    assert(r.text.contains("second paragraph closes the document"))
  }

  test("robustness: raw-text tags case-insensitive, stray ampersands/brackets") {
    val r = HtmlExtractor.extract(
      "<html><body><SCRIPT>var x = '<p>never shown</p>';</SCRIPT>" +
        "<p>a & b < c but 5 > 4 stays literal and this sentence pads out " +
        "the fifty character effective minimum easily</p></body></html>")
    assert(!r.text.contains("never shown"))
    assert(r.text.contains("a & b"))
  }

  test("control chars at block edges trim exactly like String.trim (raw and entity forms)") {
    // U+0001-U+0008 are NOT Character.isWhitespace, so whitespace-collapse
    // leaves them in place — flush must still strip chars <= 0x20 at both
    // ends (String.trim semantics), for raw chars and numeric entities alike
    val words12 = (1 to 12).map(i => s"word$i").mkString(" ")
    val html = "<p>&#3;" + words12 + "&#2;</p><p>\u0001" + words12 + "\u0004</p>"
    val r = HtmlExtractor.extract(html)
    assert(r.method == "strict")
    assert(r.text == s"${words12}\n\n${words12}")
    // interior control chars are CONTENT, not trim targets
    val ctl = "\u0003"
    val r2 = HtmlExtractor.extract(s"<p>${words12} x${ctl}y</p>")
    assert(r2.text == s"${words12} x${ctl}y")
    // a block that is nothing but control chars vanishes like one of spaces
    val r3 = HtmlExtractor.extract(s"<p>&#2;&#3;</p><p>${words12}</p>")
    assert(r3.text == words12 && r3.nBlocks == 1)
  }

  test("robustness: deeply nested divs do not blow the stack") {
    val depth = 5000
    val html = "<html><body>" + ("<div>" * depth) +
      "<p>deep nesting payload paragraph with enough words to pass the " +
      "effective character threshold gate</p>" + ("</div>" * depth) + "</body></html>"
    val r = HtmlExtractor.extract(html)
    assert(r.text.contains("deep nesting payload paragraph"))
  }
}
