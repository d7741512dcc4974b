package graft

import graft.web.Sitemap

/** Sitemap parser: protocol shapes (urlset, sitemapindex), entities,
  * comments, attributes, truncation, last-byte termination. */
class SitemapSpec extends SparkSuiteBase {

  test("urlset with optional fields, entities, whitespace, unknown children") {
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url>
        |    <loc>https://a.example/p?x=1&amp;y=2</loc>
        |    <lastmod>2026-01-07</lastmod>
        |    <changefreq>daily</changefreq>
        |    <priority>0.8</priority>
        |  </url>
        |  <url><loc> https://a.example/q </loc></url>
        |  <url><priority>0.1</priority></url>
        |</urlset>""".stripMargin
    val got = Sitemap.parse(xml)
    assert(got == Seq(
      Sitemap.Entry("url", "https://a.example/p?x=1&y=2", Some("2026-01-07"), Some("0.8")),
      Sitemap.Entry("url", "https://a.example/q", None, None))) // loc-less dropped
  }

  test("entry tags followed by newline/tab/attributes still parse") {
    val xml = "<urlset><url\n><loc>https://a.example/nl</loc></url>" +
      "<url\tid=\"2\"><loc>https://a.example/tab</loc></url>" +
      "<urlx><loc>https://fake.example/</loc></urlx></urlset>"
    assert(Sitemap.parse(xml).map(_.loc) ==
      Seq("https://a.example/nl", "https://a.example/tab")) // urlx ignored
  }

  test("sitemapindex entries carry kind sitemap and no priority") {
    val xml = "<sitemapindex><sitemap><loc>https://a.example/s1.xml</loc>" +
      "<lastmod>2026-02-01</lastmod></sitemap>" +
      "<sitemap><loc>https://a.example/s2.xml</loc></sitemap></sitemapindex>"
    assert(Sitemap.parse(xml) == Seq(
      Sitemap.Entry("sitemap", "https://a.example/s1.xml", Some("2026-02-01"), None),
      Sitemap.Entry("sitemap", "https://a.example/s2.xml", None, None)))
  }

  test("comments are stripped even when they contain fake entries; numeric refs decode") {
    val xml = "<urlset><!-- <url><loc>https://fake.example/</loc></url> -->" +
      "<url><loc>https://r.example/&#47;x&#x2F;y</loc></url></urlset>"
    assert(Sitemap.parse(xml).map(_.loc) == Seq("https://r.example//x/y"))
  }

  test("truncated trailing entry is dropped; bare ampersand survives") {
    val xml = "<urlset><url><loc>https://k.example/a&b</loc></url>" +
      "<url><loc>https://k.example/lost"
    assert(Sitemap.parse(xml).map(_.loc) == Seq("https://k.example/a&b"))
  }

  test("inputs ending exactly at a tag boundary terminate (sentinel discipline)") {
    for (xml <- Seq("", "<", "<urlset>", "<url>", "<url><loc>x</loc></url>",
        "<url><loc>x</loc></url>\n", "<url ", "<!--", "<url><loc>x&")) {
      val r = Sitemap.parse(xml) // must not hang or throw
      assert(r != null)
    }
    assert(Sitemap.parse("<url><loc>x&</loc></url>").map(_.loc) == Seq("x&"))
  }

  test("the DataFrame surface flattens (key, xml) rows without a shuffle") {
    import spark.implicits._
    val df = Seq(
      ("h1", "<urlset><url><loc>https://h1/x</loc></url></urlset>"),
      ("h2", "<sitemapindex><sitemap><loc>https://h2/s.xml</loc></sitemap></sitemapindex>"))
      .toDF("host", "xml")
    val got = Sitemap.entries(df, "host", "xml")
      .as[(String, String, String, Option[String], Option[String])].collect().toSet
    assert(got == Set(("h1", "url", "https://h1/x", None, None),
      ("h2", "sitemap", "https://h2/s.xml", None, None)))
    assert(!Sitemap.entries(df, "host", "xml")
      .queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
