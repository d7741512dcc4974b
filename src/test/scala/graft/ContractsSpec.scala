package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode
import graft.audit.Contracts
import graft.audit.Contracts._

/** Data-quality contract suite (driver gate: q_contracts). */
class ContractsSpec extends SparkSuiteBase {
  import spark.implicits._

  private val rows = Seq(
    (1L, "hello world", "en", 11L),
    (2L, "bonjour", "fr", 7L),
    (3L, "", "en", 0L),          // empty text; n_chars consistent; bounds fail
    (4L, "ciao", "it", 99L),     // lang out of domain; n_chars inconsistent
    (4L, "ciao", "it", 99L),     // duplicate id
    (5L, null, "en", 5L))        // null text, inconsistent

  private def suite = Seq(
    completeness("complete_text", col("text"), 0.5),
    uniqueness("unique_id", col("id"), 1.0),
    bounds("bounds_n_chars", col("n_chars"), 1L, 50L, 0.99),
    satisfies("consistent_n_chars", col("n_chars") === length(col("text")), 1.0),
    inDomain("lang_domain", col("lang"), Seq("en", "fr"), 0.9))

  test("metrics are exact count ratios; pass verdicts per threshold") {
    val df = rows.toDF("id", "text", "lang", "n_chars")
    val got = Contracts.run(df, suite).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getBoolean(3)))).toMap
    assert(got("complete_text") == ((0.666667, true)))   // 4/6 non-empty
    assert(got("unique_id") == ((0.833333, false)))      // 5 distinct / 6
    assert(got("bounds_n_chars") == ((0.5, false)))      // 11,7,5 in [1,50]
    assert(got("consistent_n_chars") == ((0.5, false)))  // ids 1,2,3
    assert(got("lang_domain") == ((0.666667, false)))    // 3 en + 1 fr of 6
  }

  test("whole suite is one scan: a single aggregate subtree, no UDF") {
    val df = rows.toDF("id", "text", "lang", "n_chars")
    val plan = Contracts.run(df, suite).queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(!plan.contains("ScalaUDF"), plan)
    // count_distinct's Expand is part of the same single-scan aggregate;
    // there must be no join or second scan of the input
    assert(!plan.contains("Join"), plan)
    assert("LocalTableScan|Scan".r.findAllIn(plan).size <= 3, plan)
  }

  test("runBy stratifies the suite: per-group rows, per-group metrics") {
    val df = rows.toDF("id", "text", "lang", "n_chars")
    val got = Contracts.runBy(df, Seq("lang"),
        Seq(completeness("complete_text", col("text"), 0.5))).collect()
      .map(r => r.getString(0) -> ((r.getDouble(2), r.getBoolean(4)))).toMap
    assert(got("en") == ((0.333333, false)))   // "hello world" of ("", null, hw)
    assert(got("fr") == ((1.0, true)))
    assert(got("it") == ((1.0, true)))
  }

  test("uniquenessApprox: sketch form tracks the exact fraction within rsd") {
    val unique = (0 until 2000).map(i => (i.toLong, s"t$i")).toDF("id", "text")
    val dupped = (0 until 2000).map(i => ((i % 100).toLong, s"t$i")).toDF("id", "text")
    def metric(df: org.apache.spark.sql.DataFrame): Double =
      Contracts.run(df, Seq(uniquenessApprox("u", col("id"), 0.9, 0.05)))
        .collect().head.getDouble(1)
    assert(math.abs(metric(unique) - 1.0) < 0.1)     // ~1 within sketch error
    assert(metric(dupped) < 0.1)                      // 100/2000 = 0.05 true
  }

  test("perfect data passes everything; empty suite rejected") {
    val clean = Seq((1L, "aa", "en", 2L), (2L, "bbb", "fr", 3L))
      .toDF("id", "text", "lang", "n_chars")
    val out = Contracts.run(clean, suite).collect()
    assert(out.forall(_.getBoolean(3)), out.mkString(","))
    intercept[IllegalArgumentException](Contracts.run(clean, Nil))
  }
}
