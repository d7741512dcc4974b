package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import graft.text.Mix

/** Temperature-based domain rebalancing (driver gate: q_mix). */
class MixSpec extends SparkSuiteBase {
  import spark.implicits._

  private def corpus(na: Int, nb: Int) =
    ((0 until na).map(i => (s"a$i", "big")) ++
      (0 until nb).map(i => (s"b$i", "small"))).toDF("id", "dom")

  test("mix: keep probabilities are exact sqrt ratios at alpha = 0.5") {
    val rows = Mix.probs(corpus(10000, 100), col("dom"), 0.5)
      .as[(String, Long, Double)].collect().toSeq
    assert(rows.toSet == Set(("big", 10000L, math.sqrt(100.0 / 10000.0)),
      ("small", 100L, 1.0)))
  }

  test("mix: flattens the distribution; smallest domain keeps ~everything") {
    val kept = Mix.rebalance(corpus(10000, 100), col("id"), col("dom"), 0.5)
      .groupBy("dom").count().as[(String, Long)].collect().toMap
    // big: 10000 * 0.1 = 1000 expected (hash-uniform, std ~30)
    assert(math.abs(kept("big") - 1000L) < 150, s"big kept ${kept("big")}")
    assert(kept("small") >= 99L, s"small kept ${kept("small")}")
  }

  test("mix: alpha = 1 keeps everything; alpha = 0 equalizes hardest") {
    val df = corpus(4000, 50)
    assert(Mix.rebalance(df, col("id"), col("dom"), 1.0).count() == 4050L)
    val k0 = Mix.rebalance(df, col("id"), col("dom"), 0.0)
      .groupBy("dom").count().as[(String, Long)].collect().toMap
    // alpha=0: keep_p(big) = 50/4000 -> ~50 kept per domain
    assert(math.abs(k0("big") - 50L) < 30, s"big kept ${k0("big")}")
  }

  test("mix: deterministic — a re-run selects the identical subset") {
    val df = corpus(3000, 80)
    val a = Mix.rebalance(df, col("id"), col("dom"), 0.5)
      .select("id").as[String].collect().toSet
    val b = Mix.rebalance(df, col("id"), col("dom"), 0.5)
      .select("id").as[String].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("mix: the corpus never shuffles — broadcast join only, no UDF") {
    val plan = Mix.rebalance(corpus(2000, 40), col("id"), col("dom"), 0.5)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"), plan)
    assert(!plan.contains("ScalaUDF"), plan)
  }
}
