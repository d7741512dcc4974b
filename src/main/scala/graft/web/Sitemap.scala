package graft.web

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** From-scratch sitemap-protocol parser (sitemaps.org XML schema — the
  * crawl-side discovery channel [[Robots]] and [[Frontier]] leave open):
  * `<urlset>` entries (`<url>` with `loc` / optional `lastmod` /
  * `priority`) and `<sitemapindex>` entries (`<sitemap>` with `loc` /
  * `lastmod`), emitted as flat rows. No XML runtime — a bounded scanner:
  * comments stripped first, elements matched case-sensitively per the
  * protocol, unknown children ignored, inner text trimmed and entity-
  * unescaped (the five named refs + decimal/hex numeric refs), a
  * truncated trailing entry dropped rather than guessed at.
  *
  * Scanner discipline: every position comes from `indexOf` with explicit
  * −1 handling — no `end == n` sentinels (the LinkExtractor last-byte
  * hang, CLAUDE.md).
  *
  * Reference behavior: crawl frontier seeding from per-host sitemaps;
  * at 100 TB sitemap fetches are one narrow mapPartitions over
  * (host, xml) rows — parsing never shuffles. */
object Sitemap {

  final case class Entry(kind: String, loc: String,
                         lastmod: Option[String], priority: Option[String])

  private def stripComments(s: String): String = {
    // NOTE substring, not append(s, from, to): scala.StringBuilder lacks
    // that overload and auto-tupling silently appends "(s,from,to)"
    val sb = new StringBuilder(s.length)
    var i = 0
    var open = s.indexOf("<!--")
    while (open >= 0) {
      sb.append(s.substring(i, open))
      val close = s.indexOf("-->", open + 4)
      if (close < 0) return sb.toString() // unterminated comment eats the tail
      i = close + 3
      open = s.indexOf("<!--", i)
    }
    sb.append(s.substring(i))
    sb.toString()
  }

  /** Decode the five named entity refs and numeric character refs. */
  private[web] def unescape(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '&') { sb.append(c); i += 1 }
      else {
        val semi = s.indexOf(';', i + 1)
        val body = if (semi < 0) "" else s.substring(i + 1, semi)
        val rep = body match {
          case "amp" => Some("&")
          case "lt" => Some("<")
          case "gt" => Some(">")
          case "quot" => Some("\"")
          case "apos" => Some("'")
          case b if b.startsWith("#x") || b.startsWith("#X") =>
            try Some(new String(Character.toChars(Integer.parseInt(b.drop(2), 16))))
            catch { case _: Exception => None }
          case b if b.startsWith("#") =>
            try Some(new String(Character.toChars(Integer.parseInt(b.drop(1)))))
            catch { case _: Exception => None }
          case _ => None
        }
        rep match {
          case Some(r) => sb.append(r); i = semi + 1
          case None => sb.append(c); i += 1 // not a recognized ref: literal '&'
        }
      }
    }
    sb.toString()
  }

  /** Inner text of the FIRST `<name>`/`<name attr...>` child, trimmed and
    * unescaped; None when absent or unterminated. */
  private def child(s: String, name: String): Option[String] = {
    var from = 0
    while (true) {
      val open = s.indexOf("<" + name, from)
      if (open < 0) return None
      val afterName = open + 1 + name.length
      // require a real tag boundary: '>', whitespace, or '/' follows the name
      if (afterName < s.length &&
          (s.charAt(afterName) == '>' || s.charAt(afterName) == ' ' ||
            s.charAt(afterName) == '\t' || s.charAt(afterName) == '\n' ||
            s.charAt(afterName) == '\r' || s.charAt(afterName) == '/')) {
        val gt = s.indexOf('>', afterName)
        if (gt < 0) return None
        if (s.charAt(gt - 1) == '/') return Some("") // self-closing
        val close = s.indexOf("</" + name + ">", gt + 1)
        if (close < 0) return None
        return Some(unescape(s.substring(gt + 1, close).trim))
      }
      from = afterName
    }
    None
  }

  /** Parse one sitemap document into entries. `<url>` rows carry kind
    * "url", `<sitemap>` (index) rows kind "sitemap"; entries without a
    * `<loc>` are protocol-invalid and dropped. */
  def parse(xml: String): Seq[Entry] = {
    val s = stripComments(xml)
    def entries(tag: String, kind: String): Seq[Entry] = {
      val out = Seq.newBuilder[Entry]
      var from = 0
      // a real tag boundary after the name: '>', any whitespace (attrs or
      // pretty-printing may follow), or '/' — the SAME set child() accepts
      def nextOpen(f: Int): Int = {
        var i = s.indexOf("<" + tag, f)
        while (i >= 0) {
          val after = i + 1 + tag.length
          if (after >= s.length) return -1 // truncated at the name
          val c = s.charAt(after)
          if (c == '>' || c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '/')
            return i
          i = s.indexOf("<" + tag, i + 1)
        }
        -1
      }
      var open = nextOpen(0)
      while (open >= 0) {
        val gt = s.indexOf('>', open)
        if (gt < 0) return out.result()
        val close = s.indexOf("</" + tag + ">", gt + 1)
        if (close < 0) return out.result() // truncated trailing entry: drop
        val inner = s.substring(gt + 1, close)
        child(inner, "loc").filter(_.nonEmpty).foreach { loc =>
          out += Entry(kind, loc, child(inner, "lastmod").filter(_.nonEmpty),
            if (kind == "url") child(inner, "priority").filter(_.nonEmpty) else None)
        }
        from = close + tag.length + 3
        open = nextOpen(from)
      }
      out.result()
    }
    entries("url", "url") ++ entries("sitemap", "sitemap")
  }

  /** Parse a (key, xml) relation into flat entry rows — one narrow
    * mapPartitions, no shuffle. */
  def entries(df: DataFrame, keyCol: String, xmlCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string"), col(xmlCol).cast("string"))
      .as[(String, String)]
      .flatMap { case (k, xml) =>
        parse(Option(xml).getOrElse("")).map(e =>
          (k, e.kind, e.loc, e.lastmod, e.priority)) }
      .toDF(keyCol, "kind", "loc", "lastmod", "priority")
  }
}
