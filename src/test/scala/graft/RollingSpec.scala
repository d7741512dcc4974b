package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.ExplainMode
import graft.events.Rolling

/** Rolling window aggregates (driver gate: q_rolling). */
class RollingSpec extends SparkSuiteBase {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("rows frame: exactly the last k events; range frame: trailing interval") {
    // user 1: events at t=0,10,20,100; user 2: one event
    val df = Seq(
      (1L, ts(0), 1L, 2.0), (1L, ts(10), 2L, 3.0),
      (1L, ts(20), 3L, 5.0), (1L, ts(100), 4L, 7.0),
      (2L, ts(5), 5L, 11.0))
      .toDF("user_id", "t", "event_id", "value")
    val got = Rolling.stats(df, "user_id", "t", "event_id", "value",
        k = 2, intervalUs = 15L * 1000000)
      .collect().map(r => (r.getLong(0), r.getLong(2)) ->
        ((r.getLong(3), r.getDouble(4), r.getLong(5)))).toMap
    assert(got((1L, 1L)) == ((1L, 2.0, 1L)))        // first event: itself
    assert(got((1L, 2L)) == ((2L, 5.0, 2L)))        // last2={1,2}; 15s back={1,2}
    assert(got((1L, 3L)) == ((2L, 8.0, 2L)))        // last2={2,3}; 15s back={2,3}
    assert(got((1L, 4L)) == ((2L, 12.0, 1L)))       // last2={3,4}; 15s back={4}
    assert(got((2L, 5L)) == ((1L, 11.0, 1L)))       // lone event
  }

  test("equal timestamps: rows frame tie-broken by id; range frame includes peers") {
    val df = Seq(
      (1L, ts(0), 1L, 1.0), (1L, ts(0), 2L, 10.0), (1L, ts(0), 3L, 100.0))
      .toDF("user_id", "t", "event_id", "value")
    val got = Rolling.stats(df, "user_id", "t", "event_id", "value",
        k = 2, intervalUs = 1000000L)
      .collect().map(r => r.getLong(2) -> ((r.getDouble(4), r.getLong(5)))).toMap
    assert(got(1L) == ((1.0, 3L)))      // rows: {1}; range: all 3 peers
    assert(got(2L) == ((11.0, 3L)))     // rows: {1,2}
    assert(got(3L) == ((110.0, 3L)))    // rows: {2,3}
  }

  test("one exchange serves both window frames") {
    val df = Seq((1L, ts(0), 1L, 1.0), (2L, ts(1), 2L, 2.0))
      .toDF("user_id", "t", "event_id", "value")
    val plan = Rolling.stats(df, "user_id", "t", "event_id", "value", 3, 1000000L)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected one Exchange:\n$plan")
  }
}
