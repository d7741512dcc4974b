package graft

import graft.index.Bm25

/** Block-Max WAND-pruned exact top-k: losslessness vs full scoring, the
  * block bound a strict refinement of the MaxScore term bound, block-size
  * extremes, the θ guard, plan shape. */
class BlockMaxSpec extends SparkSuiteBase {
  import spark.implicits._

  /** Oracle-form expected top-k: full scores, (rounded DESC, doc) order. */
  private def fullTopK(docs: Seq[(String, String)], query: String, k: Int) =
    Bm25.scores(docs.toDF("id", "text"), "id", "text", query)
      .as[(String, Double)].collect()
      .sortBy { case (doc, s) => (-s, doc) }.take(k).toSeq

  private val mixed = (0 until 200).map { i =>
    val words = Seq.fill(i % 5 + 1)("spark") ++ Seq.fill(i % 3)("join") ++
      Seq.fill(i % 7)("filler") ++ Seq.fill(3)(s"w$i")
    (f"d$i%03d", words.mkString(" "))
  }

  test("pruned top-k equals full-scoring top-k across block sizes") {
    for (bs <- Seq(1, 4, 1 << 20)) {
      val got = Bm25.blockMaxSearch(mixed.toDF("id", "text").repartition(4),
        "id", "text", "spark join", k = 10, seedR = 5, blockSize = bs)
        .as[(String, Double)].collect().toSeq
      assert(got == fullTopK(mixed, "spark join", 10), s"blockSize $bs")
    }
  }

  test("the block bound strictly refines the MaxScore term bound") {
    // one champion block holds all the high-tf docs (doc order == tf order
    // by construction); later blocks of the common term are all tf = 1, so
    // their block bound idf·(k1+1)·1/(1+k1(1−b)) < θ while MaxScore's
    // term-level idf·(k1+1) keeps every matched doc alive.
    val docs = (0 until 8).map(i => (f"a$i%02d", ("spark " * 9).trim)) ++
      (0 until 120).map(i => (f"z$i%03d", s"spark only once w$i"))
    val df = docs.toDF("id", "text").repartition(4)
    val (bmwTop, bmwSurv, bmwMatched) = Bm25.blockMaxParts(
      df, "id", "text", "spark", k = 4, seedR = 8, blockSize = 8)
    val (_, msSurv, _) = Bm25.maxScoreParts(
      df, "id", "text", "spark", k = 4, seedR = 8)
    val bmw = bmwSurv.as[String].collect().toSet
    val ms = msSurv.as[String].collect().toSet
    assert(bmw.subsetOf(ms), "block bound must only shrink the survivor set")
    assert(bmw.size < ms.size,
      s"expected strict refinement: bmw ${bmw.size} vs maxscore ${ms.size}")
    assert(bmwMatched.count() == 128L)
    assert(bmwTop.as[(String, Double)].collect().toSeq ==
      fullTopK(docs, "spark", 4))
  }

  test("fewer than k seeds disables pruning (θ guard) and stays exact") {
    val docs = Seq("a" -> "spark once", "b" -> "spark twice spark",
      "c" -> "unrelated body")
    val got = Bm25.blockMaxSearch(docs.toDF("id", "text"), "id", "text",
      "spark", k = 10, seedR = 1, blockSize = 2)
      .as[(String, Double)].collect().toSeq
    assert(got == fullTopK(docs, "spark", 10))
    assert(got.map(_._1) == Seq("b", "a"))
  }

  test("the θ seed leg plans as WindowGroupLimit") {
    val big = (0 until 200).map(i => (s"d$i", "spark " * (i % 7 + 1)))
    val (topk, _, _) = Bm25.blockMaxParts(big.toDF("id", "text").repartition(4),
      "id", "text", "spark", k = 5, seedR = 5, blockSize = 16)
    assert(topk.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
  }
}
