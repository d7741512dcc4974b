package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import graft.events.Sessions

/** Gap-based sessionization (driver gate: q_sessions). */
class SessionsSpec extends SparkSuiteBase {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("sessions: >= gap starts a new session, < gap extends; boundary exact") {
    // gap 600s: [1000, 1300], [1900, 2499], [10000]
    //   1900 - 1300 = 600  (>= gap → NEW)
    //   2499 - 1900 = 599  (<  gap → same)
    val events = Seq((7L, ts(1000), 1L), (7L, ts(1300), 2L), (7L, ts(1900), 3L),
      (7L, ts(2499), 4L), (7L, ts(10000), 5L)).toDF("user_id", "t", "event_id")
    val got = Sessions.summarize(events, "user_id", "t", "event_id", 600L * 1000000)
      .orderBy("session_idx")
      .select("session_idx", "n_events", "start_us", "span_us")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 1000000000L, 300000000L),
      (2L, 2L, 1900000000L, 599000000L),
      (3L, 1L, 10000000000L, 0L)))
  }

  test("sessions: summary equals the built-in session_window aggregation") {
    val rnd = new scala.util.Random(3)
    var t = 0L
    val events = (0 until 600).map { i =>
      t += rnd.nextInt(1200) // gaps 0..1199s straddle the 600s boundary
      (i % 7L, ts(t + i % 7 * 1000000), i.toLong)
    }
    val df = events.toDF("user_id", "t", "event_id")
    val ours = Sessions.summarize(df, "user_id", "t", "event_id", 600L * 1000000)
      .select(col("user"), col("start_us"), col("n_events"))
      .as[(Long, Long, Long)].collect().toSet
    val native = df.groupBy(col("user_id"), session_window(col("t"), "600 seconds"))
      .agg(count(lit(1)).as("n"), unix_micros(min(col("t"))).as("start_us"))
      .select(col("user_id"), col("start_us"), col("n"))
      .as[(Long, Long, Long)].collect().toSet
    assert(ours.nonEmpty && ours == native)
  }

  test("sessions: identical timestamps break ties on the tie column, deterministically") {
    val events = Seq((1L, ts(100), 9L), (1L, ts(100), 2L), (1L, ts(100), 5L))
      .toDF("user_id", "t", "event_id")
    val got = Sessions.assign(events, "user_id", "t", "event_id", 600L * 1000000)
      .orderBy("tie").select("tie", "session_idx")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((2L, 1L), (5L, 1L), (9L, 1L)))
  }

  test("sessions: one exchange serves both windows and the final aggregate") {
    val events = (0 until 300).map(i => (i % 5L, ts(i * 100L), i.toLong))
      .toDF("user_id", "t", "event_id")
    val plan = Sessions.summarize(events, "user_id", "t", "event_id", 600L * 1000000)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly one Exchange, got $exchanges:\n$plan")
    assert(!plan.contains("ScalaUDF"), s"ScalaUDF leaked into the plan:\n$plan")
  }
}
