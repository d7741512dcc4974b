package graft

import graft.web.Robots
import graft.web.Robots.Rule

class RobotsSpec extends SparkSuiteBase {

  private val txt =
    """# synthetic robots
      |User-agent: otherbot
      |Disallow: /
      |
      |Sitemap: https://h.example/sitemap.xml
      |
      |User-agent: GraftBot
      |User-agent: crawler
      |Disallow: /private
      |Allow: /private/ok
      |Disallow: /tmp
      |Allow: /
      |Disallow:
      |Crawl-delay: 10
      |
      |User-agent: *
      |Disallow: /secret
      |""".stripMargin

  test("group parsing: multi-agent groups, comments, unknown directives") {
    val gs = Robots.parse(txt)
    assert(gs.map(_.agents) == Vector(Vector("otherbot"), Vector("graftbot", "crawler"), Vector("*")))
    assert(gs(1).rules == Vector(
      Rule(false, "/private"), Rule(true, "/private/ok"),
      Rule(false, "/tmp"), Rule(true, "/"), Rule(false, "")))
  }

  test("group selection: case-insensitive exact token, * fallback, none") {
    assert(Robots.rulesFor(txt, "graftbot").nonEmpty)
    assert(Robots.rulesFor(txt, "CRAWLER") == Robots.rulesFor(txt, "graftbot"))
    assert(Robots.rulesFor(txt, "randombot") == Vector(Rule(false, "/secret")))
    assert(Robots.rulesFor("User-agent: a\nDisallow: /x", "b").isEmpty)
  }

  test("longest match wins; allow wins ties; empty pattern matches nothing") {
    val rules = Robots.rulesFor(txt, "graftbot")
    assert(Robots.decide(rules, "/private/item9") == (false, "disallow:/private"))
    assert(Robots.decide(rules, "/private/ok9") == (true, "allow:/private/ok"))
    assert(Robots.decide(rules, "/tmp/x") == (false, "disallow:/tmp"))
    assert(Robots.decide(rules, "/blog/post") == (true, "allow:/"))
    // tie at equal length: allow wins regardless of rule order
    val tie = Seq(Rule(false, "/dup"), Rule(true, "/dup"))
    assert(Robots.decide(tie, "/dup/x")._1)
    assert(Robots.decide(tie.reverse, "/dup/x")._1)
    // no matching rule at all => allowed, null rule
    assert(Robots.decide(Seq(Rule(false, "/q")), "/z") == (true, null))
  }

  test("wildcard and anchor matching") {
    assert(Robots.matches("/p/*.pdf", "/p/a/b/file.pdf"))
    assert(Robots.matches("/p/*.pdf$", "/p/file.pdf"))
    assert(!Robots.matches("/p/*.pdf$", "/p/file.pdf?x=1"))
    assert(Robots.matches("/*/mid/*/end$", "/a/mid/b/end"))
    assert(!Robots.matches("/*/mid/*/end$", "/a/mid/b/endX"))
    assert(Robots.matches("/a*", "/a"))        // trailing * matches empty
    assert(Robots.matches("/a$", "/a"))
    assert(!Robots.matches("/a$", "/ab"))
    // anchored tail must not overlap the middle match
    assert(!Robots.matches("/x*ab$", "/xab".dropRight(1)))
    assert(Robots.matches("*b", "ab"))          // leading *
    assert(!Robots.matches("", "/anything"))    // empty matches nothing
  }

  test("verdicts: per-domain parse-once join, missing robots => allowed") {
    val s = spark
    import s.implicits._
    val urls = Seq(
      ("1", "https://a.example/private/item1"),
      ("2", "https://a.example/private/ok2"),
      ("3", "https://a.example/blog/p3"),
      ("4", "https://norobots.example/anything"),
      ("5", "https://a.example")
    ).toDF("doc_id", "url")
    val robots = Seq(("a.example", txt)).toDF("domain", "robots_txt")
    val got = Robots.verdicts(urls, "doc_id", "url", robots, "graftbot")
      .collect().map(r => r.getString(0) -> ((r.getString(2), r.getBoolean(3), r.getString(4)))).toMap

    def at(k: String) = got(k)
    assert(at("1") == ("/private/item1", false, "disallow:/private"))
    assert(at("2") == ("/private/ok2", true, "allow:/private/ok"))
    assert(at("3") == ("/blog/p3", true, "allow:/"))
    assert(at("4") == ("/anything", true, null))   // no robots row
    assert(at("5") == ("/", true, "allow:/"))      // empty path -> "/"
  }
}
