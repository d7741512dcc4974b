package graft

import graft.text.TextAnalysis
import org.apache.spark.sql.functions.col

/** Char-bigram Shannon entropy: hand-computed values, degenerate/short/null
  * domains, and the shuffle-free plan shape. */
class EntropySpec extends SparkSuiteBase {
  import spark.implicits._

  private def h(texts: String*): Seq[Double] =
    texts.toDF("text")
      .select(TextAnalysis.charBigramEntropyCol(col("text")).as("h"))
      .as[Double].collect().toSeq

  test("hand-computed: mixed, uniform, one-run, single-bigram") {
    // "abab": bigrams {ab:2, ba:1}, H = ln3 − (2·ln2)/3 = 0.6365
    // "abcd": three distinct bigrams, H = ln3 = 1.0986
    // "aaaa": one run, H = 0 exactly (abs kills the −0.0 ulp case)
    // "ab": a single bigram, H = ln1 = 0
    assert(h("abab", "abcd", "aaaa", "ab") == Seq(0.6365, 1.0986, 0.0, 0.0))
  }

  test("short/empty/null domains define H = 0") {
    assert(h("a", "") == Seq(0.0, 0.0))
    assert(Seq((1L, null: String)).toDF("id", "text")
      .select(TextAnalysis.charBigramEntropyCol(col("text")).as("h"))
      .as[Double].collect().toSeq == Seq(0.0))
  }

  test("entropy orders texts by repetitiveness") {
    val Seq(spam, prose) = h("buy buy buy buy buy buy", "the quick brown fox jumps")
    assert(spam < prose)
  }

  test("plan is shuffle-free: no Exchange below the projection") {
    val plan = (0L until 8L).map(i => s"text number $i").toDF("text")
      .select(TextAnalysis.charBigramEntropyCol(col("text")).as("h"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
