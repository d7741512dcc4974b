package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import graft.sketch.Quantile

/** Mergeable decade-histogram quantiles (driver gate: q_quantile). */
class QuantileSketchSpec extends SparkSuiteBase {
  import spark.implicits._

  test("quantile: decade bucket rule at the digit edges; negatives clamp to 0") {
    val vs = Seq(-3L, 0L, 1L, 9L, 10L, 99L, 100L, 101L, 999L, 1000L)
    val got = Quantile.histogram(vs.map(("k", _)).toDF("key", "v"), "key", "v")
      .select("lo", "cnt").as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 2L, 1L -> 1L, 9L -> 1L, 10L -> 1L, 90L -> 1L,
      100L -> 2L, 900L -> 1L, 1000L -> 1L))
  }

  test("quantile: shard merge == whole-set histogram (lossless vector add)") {
    val rnd = new scala.util.Random(7)
    val all = (0 until 4000).map(i => (s"k${i % 3}", rnd.nextInt(100000).toLong))
    val (a, b) = all.splitAt(1500)
    val whole = Quantile.histogram(all.toDF("key", "v"), "key", "v")
      .orderBy("key", "lo").as[(String, Long, Long)].collect().toSeq
    val merged = Quantile.merge(
      Quantile.histogram(a.toDF("key", "v"), "key", "v"),
      Quantile.histogram(b.toDF("key", "v"), "key", "v"))
      .orderBy("key", "lo").as[(String, Long, Long)].collect().toSeq
    assert(whole == merged)
  }

  test("quantile: percentile bound == bucket of the ceil-rank element") {
    val rnd = new scala.util.Random(11)
    val vs = (0 until 2001).map(_ => rnd.nextInt(50000).toLong)
    val qs = Seq(100, 250, 500, 750, 900, 990)
    val hist = Quantile.histogram(vs.map(("k", _)).toDF("key", "v"), "key", "v")
    val got = Quantile.percentiles(hist, qs)
      .select("q_milli", "lo").as[(Long, Long)].collect().toMap
    def decade(v: Long): Long =
      if (v <= 0) 0L else { val s = v.toString; (s.head.toString + "0" * (s.length - 1)).toLong }
    val sorted = vs.sorted
    val expect = qs.map { q =>
      // smallest bucket whose cumulative count reaches ceil(q/1000 * n):
      // the decade of the element at 1-based rank ceil(q * n / 1000)
      val rank = (q.toLong * sorted.size + 999) / 1000
      (q.toLong, decade(sorted(rank.toInt - 1)))
    }.toMap
    assert(got == expect)
  }

  test("quantile: histogram plan is one exchange with map-side partial sums, no UDF") {
    val df = (0 until 500).map(i => ("k", i.toLong)).toDF("key", "v")
    val plan = Quantile.histogram(df, "key", "v")
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!plan.contains("ScalaUDF"), s"ScalaUDF leaked into the plan:\n$plan")
    assert(plan.contains("partial_sum"), s"no map-side partial sum:\n$plan")
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly one Exchange, got $exchanges:\n$plan")
  }
}
