package graft

import graft.text.TextRank

/** TextRank: hand-computed symmetric steady state, isolated-sentence
  * teleport floor, tie order, sentence cap, partition invariance, plan. */
class TextRankSpec extends SparkSuiteBase {
  import spark.implicits._

  test("two linked sentences hold the symmetric steady state; isolated gets teleport") {
    // sents 0,1 share {a,b} (2 multi-edges each way); sent 2 isolated.
    // outdeg 2 both: inflow = 2 * (1e12*17)//(20*2) = 850e9;
    // rank = 150e9 + 850e9 = 1e12 — a fixed point, every round.
    val docs = Seq((7L, "a b. a b. c d.")).toDF("id", "text")
    val got = TextRank.summarize(docs, "id", "text", iters = 6, topK = 3)
      .as[(Long, Long, Long)].collect().sortBy(_._2)
    assert(got.toSeq == Seq((7L, 0L, 1000000000000L), (7L, 1L, 1000000000000L),
      (7L, 2L, 150000000000L)))
  }

  test("topK cut keeps the best-connected sentences, ties by position") {
    val docs = Seq((1L, "x y. x y. q r.")).toDF("id", "text")
    val got = TextRank.summarize(docs, "id", "text", iters = 4, topK = 2)
      .as[(Long, Long, Long)].collect().map(_._2).sorted
    assert(got.toSeq == Seq(0L, 1L))
  }

  test("empty segments keep slot indices; all-empty docs emit nothing") {
    // leading '.' makes slot 0 empty: real sentences sit at 1 and 2
    val docs = Seq((1L, ". alpha beta. alpha beta."), (2L, "... !!")).toDF("id", "text")
    val got = TextRank.summarize(docs, "id", "text", iters = 2, topK = 5)
      .as[(Long, Long, Long)].collect()
    assert(got.map(_._1).toSet == Set(1L))
    assert(got.map(_._2).sorted.toSeq == Seq(1L, 2L))
  }

  test("sentence cap bounds the graph; results are partition-invariant") {
    val longDoc = (0 until 300).map(i => s"w$i shared").mkString(". ")
    val docs = (0L until 8L).map(d => (d, longDoc))
    def run(parts: Int) =
      TextRank.summarize(docs.toDF("id", "text").repartition(parts),
        "id", "text", iters = 3, topK = 2)
        .as[(Long, Long, Long)].collect().toSet
    val a = run(1)
    assert(a == run(5))
    assert(a.forall(_._2 < TextRank.MaxSents))
  }

  test("the top-k cut plans as WindowGroupLimit") {
    val docs = (0L until 40L).map(d => (d, "a b. a c. b c. d e.")).toDF("id", "text")
    val df = TextRank.summarize(docs.repartition(4), "id", "text", iters = 1, topK = 2)
    assert(df.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
  }
}
