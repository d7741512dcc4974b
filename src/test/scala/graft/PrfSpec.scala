package graft

import graft.index.Prf

/** Pseudo-relevance feedback: hand-computed expansion mining (mask,
  * integer rank, tie order) and the recall win — an expanded query
  * reaching a doc the original query cannot see. */
class PrfSpec extends SparkSuiteBase {
  import spark.implicits._

  private val docs = Seq(
    "f1" -> "alpha telescope mirror telescope",
    "f2" -> "alpha telescope lens",
    "n1" -> "telescope astronomy lens",
    "x1" -> "unrelated words entirely banana")

  test("expansion terms: summed tf first, feedback-df then term tiebreaks") {
    val got = Prf.expansionTerms(docs.toDF("id", "text"), "id", "text",
        "alpha", k = 2, m = 2)
      .as[(Int, String, Long, Long)].collect().toSeq
    assert(got == Seq((1, "telescope", 3L, 2L), (2, "lens", 1L, 1L)))
  }

  test("mask: stopwords, short tokens and original query terms never expand") {
    val d = Seq("f" -> "alpha the with cat dog alpha alpha significant")
    val got = Prf.expansionTerms(d.toDF("id", "text"), "id", "text",
        "alpha", k = 1, m = 10)
      .as[(Int, String, Long, Long)].collect().toSeq
    // 'the'/'with' stopworded, 'cat'/'dog' under minLen 4, 'alpha' is the query
    assert(got == Seq((1, "significant", 1L, 1L)))
  }

  test("recall win: the expanded query reaches an alpha-less doc") {
    val base = graft.index.Bm25.scores(docs.toDF("id", "text"), "id", "text", "alpha")
      .as[(String, Double)].collect().toMap
    assert(!base.contains("n1"))
    val prf = Prf.search(docs.toDF("id", "text"), "id", "text",
        "alpha", k = 2, m = 2)
      .as[(String, Double)].collect().toMap
    assert(prf.contains("n1") && prf("n1") > 0)
    assert(!prf.contains("x1"))
    // feedback docs still rank above the expansion-only doc
    assert(prf("f1") > prf("n1") || prf("f2") > prf("n1"))
  }
}
