package graft

import java.sql.Timestamp
import graft.events.Funnel

/** Ordered funnel analysis (driver gate: q_funnel). */
class FunnelSpec extends SparkSuiteBase {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)
  private val steps = Seq("view", "click", "buy")

  test("funnel: earliest chain; out-of-order events never count; strict >") {
    val events = Seq(
      // u1: buy BEFORE any view is invisible; then full chain
      (1L, "buy", 10L), (1L, "view", 20L), (1L, "click", 30L), (1L, "buy", 40L),
      // u2: click only before view → stops at step 1
      (2L, "click", 5L), (2L, "view", 50L),
      // u3: click at the SAME instant as view — strict > rejects it
      (3L, "view", 100L), (3L, "click", 100L), (3L, "buy", 200L),
      // u4: earliest view wins, later duplicate steps ignored
      (4L, "view", 1L), (4L, "view", 2L), (4L, "click", 3L), (4L, "click", 4L), (4L, "buy", 5L))
      .map { case (u, t, s) => (u, t, ts(s)) }.toDF("user_id", "event_type", "t")
    val got = Funnel.earliest(events, "user_id", "event_type", "t", steps)
      .select("user", "step_idx", "step_ts_us")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 1L, 20000000L), (1L, 2L, 30000000L), (1L, 3L, 40000000L),
      (2L, 1L, 50000000L),
      (3L, 1L, 100000000L),
      (4L, 1L, 1000000L), (4L, 2L, 3000000L), (4L, 3L, 5000000L)))
    val depth = Funnel.depth(events, "user_id", "event_type", "t", steps)
      .as[(Long, Long)].collect().toMap
    assert(depth == Map(1L -> 3L, 2L -> 1L, 3L -> 1L, 4L -> 3L))
  }

  test("funnel: users with no step-1 event are absent entirely") {
    val events = Seq((9L, "click", ts(1L)), (9L, "buy", ts(2L)))
      .toDF("user_id", "event_type", "t")
    assert(Funnel.earliest(events, "user_id", "event_type", "t", steps).count() == 0)
  }

  test("funnel: matches brute-force chain on a random stream") {
    val rnd = new scala.util.Random(17)
    val types = Vector("view", "click", "buy", "noise")
    val events = (0 until 800).map(i =>
      (rnd.nextInt(25).toLong, types(rnd.nextInt(4)), ts(rnd.nextInt(100000).toLong)))
    val got = Funnel.earliest(events.toDF("user_id", "event_type", "t"),
        "user_id", "event_type", "t", steps)
      .select("user", "step_idx", "step_ts_us")
      .as[(Long, Long, Long)].collect().toSet
    var expect = Set.empty[(Long, Long, Long)]
    events.groupBy(_._1).foreach { case (u, evs) =>
      var prev = Long.MinValue
      var i = 0
      var going = true
      while (going && i < steps.length) {
        val cand = evs.filter(e => e._2 == steps(i) && e._3.getTime * 1000 > prev)
        if (cand.isEmpty) going = false
        else {
          prev = cand.map(_._3.getTime * 1000).min
          expect += ((u, i + 1L, prev))
          i += 1
        }
      }
    }
    assert(got == expect && got.nonEmpty)
  }
}
