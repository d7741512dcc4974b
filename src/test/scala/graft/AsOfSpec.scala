package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import graft.events.AsOf

/** Backward as-of join (driver gate: q_asof). */
class AsOfSpec extends SparkSuiteBase {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  private def df(rows: Seq[(Long, Long, Long)]) =
    rows.map { case (u, t, id) => (u, ts(t), id) }.toDF("user_id", "t", "event_id")

  test("asof: most recent at-or-before; ties included; unmatched null") {
    val left = df(Seq((1L, 100L, 10L), (1L, 50L, 11L), (2L, 30L, 12L)))
    val right = df(Seq((1L, 90L, 20L), (1L, 100L, 21L), (1L, 10L, 22L)))
    val got = AsOf.prior(left, right, "user_id", "t", "event_id")
      .select("key", "lid", "r_id", "gap_us")
      .as[(Long, Long, Option[Long], Option[Long])].collect().toSet
    assert(got == Set(
      (1L, 10L, Some(21L), Some(0L)),          // tie at t=100 matches
      (1L, 11L, Some(22L), Some(40000000L)),   // 90/100 are AFTER 50
      (2L, 12L, None, None)))                  // user 2 has no views
  }

  test("asof: multiple right rows at the same instant collapse to max id") {
    val left = df(Seq((1L, 100L, 1L)))
    val right = df(Seq((1L, 80L, 5L), (1L, 80L, 9L), (1L, 80L, 7L)))
    val got = AsOf.prior(left, right, "user_id", "t", "event_id")
      .select("r_id").as[Long].collect().toSeq
    assert(got == Seq(9L))
  }

  test("asof: equals the brute-force per-left maximum on random data") {
    val rnd = new scala.util.Random(11)
    val l = (0 until 400).map(i => (rnd.nextInt(9).toLong, rnd.nextInt(5000).toLong, i.toLong))
    val r = (0 until 400).map(i => (rnd.nextInt(9).toLong, rnd.nextInt(5000).toLong, 1000L + i))
    val got = AsOf.prior(df(l), df(r), "user_id", "t", "event_id")
      .select("lid", "r_id", "r_ts_us")
      .as[(Long, Option[Long], Option[Long])].collect().toSet
    // brute force: dedup right to (key, ts) -> max id, then per-left argmax ts
    val rr = r.groupBy(x => (x._1, x._2)).map { case ((u, t), xs) => (u, t, xs.map(_._3).max) }.toSeq
    val want = l.map { case (u, t, id) =>
      val cand = rr.filter(x => x._1 == u && x._2 <= t)
      if (cand.isEmpty) (id, None, None)
      else {
        val best = cand.maxBy(_._2)
        (id, Some(best._3), Some(best._2 * 1000000L))
      }
    }.toSet
    assert(got == want)
  }

  test("asof: one exchange on the key, no UDF") {
    val left = df((0 until 300).map(i => (i % 5L, i * 100L, i.toLong)))
    val right = df((0 until 300).map(i => (i % 5L, i * 90L, 1000L + i)))
    val plan = AsOf.prior(left, right, "user_id", "t", "event_id")
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly one Exchange, got $exchanges:\n$plan")
    assert(!plan.contains("ScalaUDF"), s"ScalaUDF leaked into the plan:\n$plan")
  }
}
