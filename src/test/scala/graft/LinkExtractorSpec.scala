package graft

import graft.corpus.HtmlGen
import graft.extract.html.LinkExtractor
import graft.extract.html.LinkExtractor.Link

/** Hyperlink extraction (driver gate: q_links). */
class LinkExtractorSpec extends SparkSuiteBase {

  test("links: the article template yields its closed-form 10-link table in order") {
    val html = HtmlGen.article("Doc 5", Seq("some body text"), 5,
      Seq("alpha beta related", "gamma delta entry"))
    val got = LinkExtractor.links(html)
    assert(got == Vector(
      Link(1, "/", "host5.example"),
      Link(2, "/", "Home"),
      Link(3, "/about", "About h5"),
      Link(4, "/archive", "Archive"),
      Link(5, "/contact", "Contact"),
      Link(6, "/r/alpha-beta-related", "alpha beta related"),
      Link(7, "/r/gamma-delta-entry", "gamma delta entry"),
      Link(8, "/terms", "Terms"),
      Link(9, "/privacy", "Privacy"),
      Link(10, "/rss", "RSS")))
  }

  test("links: comments, script strings, and hrefless anchors never produce links") {
    val html =
      """<body>
        |<!-- <a href="/ghost">ghost</a> -->
        |<script>document.write('<a href="/fake">fake</a>');</script>
        |<style>a[href="/styled"] { color: red }</style>
        |<a name="top">named anchor, no href</a>
        |<a href="/real">real</a>
        |</body>""".stripMargin
    assert(LinkExtractor.links(html) == Vector(Link(1, "/real", "real")))
  }

  test("links: attribute edge cases — unquoted, single-quoted, '>' in value, hreflang, data-href, first-wins") {
    val html =
      """<a href=/unquoted>u</a>
        |<a href='/single'>s</a>
        |<a href="/gt>inside" id="x">g</a>
        |<a hreflang="en" href="/after-lang">h</a>
        |<a data-href="/not-this" href="/this">d</a>
        |<a href="/first" href="/second">f</a>""".stripMargin
    assert(LinkExtractor.links(html).map(l => (l.href, l.anchor)) == Vector(
      ("/unquoted", "u"), ("/single", "s"), ("/gt>inside", "g"),
      ("/after-lang", "h"), ("/this", "d"), ("/first", "f")))
  }

  test("links: anchor text is entity-decoded, whitespace-collapsed; inner markup contributes text only") {
    val html = """<a href="/x">  A &amp; B
                 |  <b>bold</b>&nbsp;tail  </a>""".stripMargin
    assert(LinkExtractor.links(html) == Vector(Link(1, "/x", "A & B bold tail")))
  }

  test("links: nested <a> implicitly closes; self-closing emits empty anchor; EOF-open is dropped") {
    val html = """<a href="/outer">out <a href="/inner">in</a>
                 |<a href="/self"/>
                 |<a href="/unterminated">never closed""".stripMargin
    assert(LinkExtractor.links(html).map(l => (l.href, l.anchor)) == Vector(
      ("/outer", "out"), ("/inner", "in"), ("/self", "")))
    // regression: a '>' as the very LAST character (tagEnd == length)
    // and a tag truncated mid-attributes must both terminate
    assert(LinkExtractor.links("""<a href="/e">e</a>""") == Vector(Link(1, "/e", "e")))
    assert(LinkExtractor.links("""text <a href="/cut""") == Vector())
  }

  test("links: the link farm extracts every farm item plus chrome") {
    val farm = HtmlGen.linkFarm(3, Seq("one two", "three"))
    val got = LinkExtractor.links(farm).map(_.href)
    assert(got == Vector("/", "/about", "/archive", "/contact",
      "/x/one-two", "/x/three", "/terms", "/privacy", "/rss"))
  }
}
