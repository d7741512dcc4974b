package graft

import org.apache.spark.sql.execution.ExplainMode
import graft.index.Keywords

/** Per-doc integer-ranked keyword extraction (driver gate: q_keywords). */
class KeywordsSpec extends SparkSuiteBase {
  import spark.implicits._

  test("keywords: tf-first rank, rarity tiebreak, term tiebreak; stopword/length mask") {
    val docs = Seq(
      // d1: zebra ×3; apple ×2 and mango ×2 tie on tf — mango is rarer
      // (df 1 vs apple's 2) so mango outranks apple; "the"/"and" masked,
      // "cat" masked by minLen 4
      ("d1", "zebra zebra zebra apple apple mango mango the and cat"),
      ("d2", "apple banana banana cherry cherry cherry"))
    val got = Keywords.topK(docs.toDF("id", "text"), "id", "text", k = 3)
      .orderBy("doc", "rank")
      .select("doc", "rank", "term", "tf", "df")
      .as[(String, Int, String, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("d1", 1, "zebra", 3L, 1L),
      ("d1", 2, "mango", 2L, 1L),
      ("d1", 3, "apple", 2L, 2L),
      ("d2", 1, "cherry", 3L, 1L),
      ("d2", 2, "banana", 2L, 1L),
      ("d2", 3, "apple", 1L, 2L)))
  }

  test("keywords: k bounds output per doc; docs with no surviving terms emit nothing") {
    val docs = Seq(("full", "alpha beta gamma delta epsilon"),
      ("empty", "the and a of to in")).toDF("id", "text")
    val got = Keywords.topK(docs, "id", "text", k = 2)
      .select("doc").as[String].collect()
    assert(got.count(_ == "full") == 2 && !got.contains("empty"))
  }

  test("keywords: top-k is the WindowGroupLimit shape; no UDF") {
    val docs = (0 until 50).map(i => (s"d$i", s"alpha beta gamma word$i")).toDF("id", "text")
    val plan = Keywords.topK(docs, "id", "text")
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("WindowGroupLimit"), s"rank cap not map-side truncated:\n$plan")
    assert(!plan.contains("ScalaUDF"), s"ScalaUDF leaked into the plan:\n$plan")
  }
}
