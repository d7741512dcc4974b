package graft

import graft.index.Bm25

/** Champion-list retrieval: candidate cut semantics, exact rescoring,
  * tf tie order, full-recall reduction at large r, plan shape. */
class ChampionSpec extends SparkSuiteBase {
  import spark.implicits._

  private val docs = Seq(
    "a" -> "spark spark spark content here",
    "b" -> "spark spark words words words",
    "c" -> "spark once only in this doc",
    "d" -> "join join appears twice here",
    "e" -> "join once and nothing else",
    "f" -> "entirely unrelated text body")

  private def champs(r: Int) =
    Bm25.championSearch(docs.toDF("id", "text"), "id", "text", "spark join", r)
      .as[(String, Double)].collect().toMap

  test("candidates are the union of per-term top-r by tf; scores stay exact") {
    val got = champs(2)
    // spark champions {a, b}; join champions {d, e}; c matches but is cut
    assert(got.keySet == Set("a", "b", "d", "e"))
    val full = Bm25.scores(docs.toDF("id", "text"), "id", "text", "spark join")
      .as[(String, Double)].collect().toMap
    got.foreach { case (doc, s) => assert(s == full(doc), doc) }
  }

  test("r covering every posting reduces to the full match set") {
    val full = Bm25.scores(docs.toDF("id", "text"), "id", "text", "spark join")
      .as[(String, Double)].collect().toMap
    assert(champs(10) == full)
  }

  test("tf ties select the smaller doc id") {
    val tied = Seq("x" -> "term", "y" -> "term", "z" -> "term")
    val got = Bm25.championSearch(tied.toDF("id", "text"), "id", "text", "term", r = 2)
      .as[(String, Double)].collect().toMap
    assert(got.keySet == Set("x", "y"))
  }

  test("the champion cut plans as WindowGroupLimit") {
    val big = (0 until 200).map(i => (s"d$i", "spark " * (i % 7 + 1)))
    val df = Bm25.championSearch(big.toDF("id", "text").repartition(4),
      "id", "text", "spark", r = 5)
    assert(df.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
  }
}
