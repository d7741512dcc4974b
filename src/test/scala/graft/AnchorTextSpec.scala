package graft

import graft.graph.AnchorText

/** Anchor-text aggregation (driver gate: q_anchors). */
class AnchorTextSpec extends SparkSuiteBase {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long, String)], cap: Int = 3) =
    AnchorText.aggregate(edges.toDF("src", "dst", "anchor"), cap)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap

  test("anchors: count-ordered keep with exact pre-cap totals") {
    val out = run(Seq(
      (1L, 9L, "home"), (2L, 9L, "home"), (3L, 9L, "home"),
      (4L, 9L, "docs"), (5L, 9L, "docs"),
      (6L, 9L, "api"), (7L, 9L, "blog"), (8L, 9L, "zzz")))
    // cap 3 keeps home:3, docs:2, then the tie api/blog/zzz breaks to api
    assert(out(9L) == ((8L, 5L, "home:3 | docs:2 | api:1")))
  }

  test("anchors: tie order is (count desc, anchor asc); cap binds exactly") {
    val out = run(Seq(
      (1L, 5L, "b"), (2L, 5L, "a"), (3L, 5L, "c"), (4L, 5L, "d")), cap = 2)
    assert(out(5L) == ((4L, 4L, "a:1 | b:1")))
  }

  test("anchors: targets with no in-links are absent; cap larger than list is a no-op") {
    val out = run(Seq((1L, 2L, "x")), cap = 10)
    assert(out == Map(2L -> ((1L, 1L, "x:1"))))
  }
}
