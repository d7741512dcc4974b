package graft.corpus

/** Deterministic HTML page renderer for the synthetic corpus
  * (FIXTURES.md §1 archetypes: article, link farm, noisy markup).
  *
  * The boilerplate shape (nav/header/sidebar/footer around a main article)
  * is the web-domain translation of the reference's scanned-vs-text PDF mix
  * (SURVEY.md §0): the extractor must separate main content from chrome the
  * way the reference separates text layer from OCR noise.
  */
object HtmlGen {

  private def escape(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case c   => c.toString
    }

  private def navBlock(host: Int): String =
    s"""<nav class="top"><ul>
       |<li><a href="/">Home</a></li>
       |<li><a href="/about">About h$host</a></li>
       |<li><a href="/archive">Archive</a></li>
       |<li><a href="/contact">Contact</a></li>
       |</ul></nav>""".stripMargin

  private def sidebar(links: Seq[String]): String =
    "<aside class=\"sidebar\"><h3>Related</h3><ul>" +
      links.map(l => s"""<li><a href="/r/${l.replace(' ', '-')}">${escape(l)}</a></li>""").mkString +
      "</ul></aside>"

  private def footer(host: Int): String =
    s"""<footer><p>© 2026 host$host.example — <a href="/terms">Terms</a> ·
       |<a href="/privacy">Privacy</a> · <a href="/rss">RSS</a></p></footer>""".stripMargin

  /** Standard article: boilerplate chrome + main content paragraphs.
    * Paragraph text is emitted verbatim (escaped) so extraction roundtrips:
    * extracted text == paragraphs.mkString("\n\n"). */
  def article(title: String, paragraphs: Seq[String], host: Int, related: Seq[String]): String = {
    val body = paragraphs.map(p => s"<p>${escape(p)}</p>").mkString("\n")
    s"""<!DOCTYPE html>
       |<html><head><title>${escape(title)}</title>
       |<meta charset="utf-8">
       |<style>body { font: 14px serif; } .sidebar { float: right; }</style>
       |<script>var tracker = "<p>not content</p>"; track(1 > 0);</script>
       |</head>
       |<body>
       |<header><h1>${escape(title)}</h1><p><a href="/">host$host.example</a> news index</p></header>
       |${navBlock(host)}
       |${sidebar(related)}
       |<main>
       |<article>
       |$body
       |</article>
       |</main>
       |${footer(host)}
       |</body></html>
       |""".stripMargin
  }

  /** Link farm: >80% anchor text, nearly no prose — the classifier must
    * yield empty/near-empty main text (reference analog: `empty_text` skip,
    * src/services/RAG/convert_to_embeddings.py:357-358). */
  def linkFarm(host: Int, links: Seq[String]): String = {
    val items = links.map(l =>
      s"""<div class="lk"><a href="/x/${l.replace(' ', '-')}">${escape(l)}</a></div>""").mkString("\n")
    s"""<!DOCTYPE html>
       |<html><head><title>links h$host</title></head>
       |<body>
       |${navBlock(host)}
       |$items
       |${footer(host)}
       |</body></html>
       |""".stripMargin
  }

  /** Noisy page: comments, nested tables, inline script/style — tokenizer
    * robustness archetype. The table cell texts are the payload. */
  def noisy(title: String, cells: Seq[String], host: Int): String = {
    val rows = cells.grouped(3).map { g =>
      "<tr>" + g.map(c => s"<td>${escape(c)}</td>").mkString + "</tr>"
    }.mkString("\n")
    s"""<html><head><title>${escape(title)}</title></head>
       |<body>
       |<!-- generated ${title.hashCode} --><!-- <p>commented out</p> -->
       |${navBlock(host)}
       |<table class="outer"><tr><td>
       |<table class="inner">
       |$rows
       |</table>
       |</td></tr></table>
       |<script type="text/javascript">
       |  document.write("<table><tr><td>fake</td></tr></table>");
       |</script>
       |${footer(host)}
       |</body></html>
       |""".stripMargin
  }
}
