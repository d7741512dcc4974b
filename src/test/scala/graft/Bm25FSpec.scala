package graft

import graft.index.{Bm25, Bm25F}

/** BM25F: hand-computed fielded scores (b=0 kills length norm for exact
  * arithmetic), single-field reduction to BM25 (up to its (k1+1) factor),
  * anchor-weight monotonicity, unknown-field exclusion. */
class Bm25FSpec extends SparkSuiteBase {
  import spark.implicits._

  private def run(rows: Seq[(String, String, String)], query: String,
                  params: Map[String, (Double, Double)]) =
    Bm25F.scores(rows.toDF("doc", "field", "text"), "doc", "field", "text",
        query, params)
      .as[(String, Double)].collect().toMap

  test("hand-computed: weighted field tfs sum before one saturation") {
    val rows = Seq(
      ("d1", "body", "cat dog cat"), ("d1", "anchor", "cat"),
      ("d2", "body", "dog dog dog bird"),
      ("d3", "body", "fish"), ("d3", "anchor", "cat cat"))
    val got = run(rows, "cat",
      Map("body" -> (1.0, 0.0), "anchor" -> (2.0, 0.0)))
    // tfn(d1) = 1*2 + 2*1 = 4; tfn(d3) = 2*2 = 4; df = 2, N = 3
    // score = ln(1.6) * 4 / (1.2 + 4) = 0.3615 at 4 dp
    assert(got == Map("d1" -> 0.3615, "d3" -> 0.3615))
  }

  test("one unit-weight field reduces to BM25 modulo the (k1+1) factor") {
    val docs = Seq(
      "a" -> "spark filters data quickly with spark",
      "b" -> "tables join other tables", "c" -> "spark join table filter here",
      "d" -> "nothing relevant at all whatsoever")
    val plain = Bm25.scores(docs.toDF("id", "text"), "id", "text", "spark join")
      .as[(String, Double)].collect().toMap
    val fielded = run(docs.map { case (id, t) => (id, "body", t) },
      "spark join", Map("body" -> (1.0, 0.75)))
    assert(plain.keySet == fielded.keySet)
    plain.foreach { case (doc, s) =>
      assert(math.abs(fielded(doc) * (Bm25.K1 + 1.0) - s) < 2e-4, doc)
    }
  }

  test("anchor weight promotes anchor-endorsed docs past body-only hits") {
    val rows = Seq(
      ("bodyhit", "body", "query word inside the body text once"),
      ("anchhit", "body", "completely unrelated body content here"),
      ("anchhit", "anchor", "query query"))
    val got = run(rows, "query",
      Map("body" -> (1.0, 0.75), "anchor" -> (4.0, 0.0)))
    assert(got("anchhit") > got("bodyhit"))
  }

  test("fields outside fieldParams are ignored entirely") {
    val rows = Seq(
      ("d", "body", "cat"), ("d", "title", "cat cat cat cat"))
    val withTitle = run(rows, "cat", Map("body" -> (1.0, 0.0)))
    val withoutTitle = run(rows.take(1), "cat", Map("body" -> (1.0, 0.0)))
    assert(withTitle == withoutTitle)
  }
}
