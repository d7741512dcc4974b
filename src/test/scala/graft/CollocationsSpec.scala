package graft

import org.apache.spark.sql.execution.ExplainMode
import graft.text.Collocations

/** PMI-family collocation mining (driver gate: q_colloc). */
class CollocationsSpec extends SparkSuiteBase {
  import spark.implicits._

  test("lift is the exact association ratio; min-support prunes; order total") {
    // "new york" always together (perfect collocation); "the cat"/"the dog"
    // share the promiscuous "the" (low lift); "rare pair" once (under support)
    val docs = Seq(
      "new york new york the cat",
      "new york the dog",
      "rare pair the cat").toDF("text")
    val got = Collocations.topLift(docs, "text", minCount = 2, k = 10).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // token count N_bigrams = 5+3+3 = 11; "new york": cnt_ab=3, cnt_new=3,
    // cnt_york=3 -> lift = 3*11/9 = 3.666667; "the cat": 2*11/(3*2) = 3.666667
    // (tie -> 'new' < 'the'); "york new": 1 -> under support
    assert(got.head == (("new", "york", 3L, 3.666667)))
    assert(got(1) == (("the", "cat", 2L, 3.666667)))
    assert(!got.exists(p => p._1 == "york" && p._2 == "new"))
    assert(!got.exists(p => p._1 == "rare"))
  }

  test("bigrams never cross document boundaries") {
    val docs = Seq("alpha beta", "beta gamma", "gamma alpha").toDF("text")
    val got = Collocations.topLift(docs, "text", 1, 100).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("alpha", "beta"), ("beta", "gamma"), ("gamma", "alpha")))
  }

  test("plan: top-k is TakeOrderedAndProject, bigram build is narrow (no self-join)") {
    val docs = Seq("a b c d e").toDF("text")
    val plan = Collocations.topLift(docs, "text", 1, 5).queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("ScalaUDF"), plan)
  }
}
