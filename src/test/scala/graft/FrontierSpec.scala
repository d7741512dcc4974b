package graft

import graft.web.Frontier

/** Frontier politeness schedule: per-host spacing, priority order, null
  * priorities last, horizon cap, WindowGroupLimit plan, partition
  * invariance. */
class FrontierSpec extends SparkSuiteBase {
  import spark.implicits._

  private def run(rows: Seq[(String, String, java.lang.Long)],
                  delayMs: Long = 1000L, cap: Int = Int.MaxValue, parts: Int = 4) =
    Frontier.schedule(
        rows.toDF("url", "host", "priority").repartition(parts),
        "url", "host", "priority", delayMs, cap)
      .as[(String, String, Option[Long], Long, Long)].collect()
      .map(r => r._1 -> (r._4, r._5)).toMap

  test("per-host spacing with priority-first order; hosts independent") {
    val rows = Seq[(String, String, java.lang.Long)](
      ("a/low", "a", 1L), ("a/high", "a", 9L), ("a/mid", "a", 5L),
      ("b/only", "b", 0L))
    assert(run(rows) == Map(
      "a/high" -> (0L, 0L), "a/mid" -> (1L, 1000L), "a/low" -> (2L, 2000L),
      "b/only" -> (0L, 0L)))
  }

  test("priority ties break on the url; null priority sorts last") {
    val rows = Seq[(String, String, java.lang.Long)](
      ("a/b", "a", 5L), ("a/a", "a", 5L), ("a/z", "a", null))
    assert(run(rows) == Map(
      "a/a" -> (0L, 0L), "a/b" -> (1L, 1000L), "a/z" -> (2L, 2000L)))
  }

  test("maxPerHost horizon excludes the overflow, keeps the best") {
    val rows = (0 until 10).map(i =>
      (s"a/u$i", "a", java.lang.Long.valueOf(i.toLong)))
    val got = run(rows, cap = 3)
    assert(got.keySet == Set("a/u9", "a/u8", "a/u7"))
    assert(got("a/u9") == (0L, 0L) && got("a/u7") == (2L, 2000L))
  }

  test("the cap plans as WindowGroupLimit (map-side truncation)") {
    val rows = (0 until 100).map(i => (s"h${i % 5}/u$i", s"h${i % 5}", i.toLong))
    val df = Frontier.schedule(
      rows.toDF("url", "host", "priority").repartition(4),
      "url", "host", "priority", 100L, maxPerHost = 8)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("pure function of the frontier: partitioning does not matter") {
    val rnd = new scala.util.Random(19)
    val rows = (0 until 200).map { i =>
      val h = rnd.nextInt(9)
      (s"h$h/p$i", s"h$h", java.lang.Long.valueOf(rnd.nextInt(50).toLong))
    }
    assert(run(rows, cap = 7, parts = 1) == run(rows, cap = 7, parts = 11))
  }
}
