package graft

import graft.index.Bm25

/** MaxScore-pruned exact top-k: losslessness vs full scoring, the bound
  * visibly binding, the fewer-than-k-seeds θ guard, plan shape. */
class MaxScoreSpec extends SparkSuiteBase {
  import spark.implicits._

  /** Oracle-form expected top-k: full scores, (rounded DESC, doc) order. */
  private def fullTopK(docs: Seq[(String, String)], query: String, k: Int) =
    Bm25.scores(docs.toDF("id", "text"), "id", "text", query)
      .as[(String, Double)].collect()
      .sortBy { case (doc, s) => (-s, doc) }.take(k).toSeq

  test("pruned top-k equals full-scoring top-k on a mixed corpus") {
    val docs = (0 until 200).map { i =>
      val words = Seq.fill(i % 5 + 1)("spark") ++ Seq.fill(i % 3)("join") ++
        Seq.fill(i % 7)("filler") ++ Seq.fill(3)(s"w$i")
      (f"d$i%03d", words.mkString(" "))
    }
    val got = Bm25.maxScoreSearch(docs.toDF("id", "text").repartition(4),
      "id", "text", "spark join", k = 10, seedR = 5)
      .as[(String, Double)].collect().toSeq
    assert(got == fullTopK(docs, "spark join", 10))
  }

  test("the saturation bound prunes low-idf-only docs before the dl join") {
    // 3 docs match the rare term (huge idf); 100 match only the common one
    // (idf ~ ln(1.005) -> ub ~ 0.01 << θ ~ 3): survivors ≪ matched.
    val docs = (0 until 3).map(i => (f"r$i%02d", "rare common rare extra")) ++
      (0 until 100).map(i => (f"c$i%03d", "common words only here"))
    val (topk, survivors, matched) = Bm25.maxScoreParts(
      docs.toDF("id", "text").repartition(4), "id", "text",
      "rare common", k = 2, seedR = 3)
    val nSurv = survivors.count()
    val nMatch = matched.count()
    assert(nMatch == 103L)
    assert(nSurv < 10L, s"bound did not bind: $nSurv of $nMatch survived")
    assert(topk.as[(String, Double)].collect().toSeq ==
      fullTopK(docs, "rare common", 2))
  }

  test("fewer than k seeds disables pruning (θ guard) and stays exact") {
    val docs = Seq("a" -> "spark once", "b" -> "spark twice spark",
      "c" -> "unrelated body")
    val got = Bm25.maxScoreSearch(docs.toDF("id", "text"), "id", "text",
      "spark", k = 10, seedR = 1)
      .as[(String, Double)].collect().toSeq
    assert(got == fullTopK(docs, "spark", 10))
    assert(got.map(_._1) == Seq("b", "a"))
  }

  test("the θ seed leg plans as WindowGroupLimit") {
    val big = (0 until 200).map(i => (s"d$i", "spark " * (i % 7 + 1)))
    val (topk, _, _) = Bm25.maxScoreParts(big.toDF("id", "text").repartition(4),
      "id", "text", "spark", k = 5, seedR = 5)
    assert(topk.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
  }
}
