package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the classic clickstream/analytics operator
  * (and the semantics of Spark's own `session_window`): per user, an
  * event starts a NEW session iff it arrives ≥ `gapUs` after the previous
  * event (so a session is a maximal chain of sub-gap steps). Computed on
  * exact epoch MICROSECONDS (`unix_micros` here, `epoch_us` in DuckDB —
  * both BIGINT), so there is no float or truncation anywhere and the
  * assignment replicates across engines bit-for-bit; ties at identical
  * timestamps order by the caller's tie column.
  *
  * SessionsSpec pins equality with the built-in
  * `session_window(ts, gap)` aggregation — this form exists because
  * downstream joins need the PER-EVENT session id (`assign`), which the
  * built-in's merged-window aggregate does not expose.
  *
  * Plan shape: ONE exchange on the user key serves everything — the lag
  * window, the cumulative-sum window (same partition+order, one Sort),
  * and the final (user, session_idx) aggregate (user ⊆ group keys, so
  * the partitioning satisfies the aggregate's distribution; no second
  * shuffle). Per-user state is a sort, not a collect — skewed power
  * users spill, never OOM the driver.
  */
object Sessions {

  /** Per-event session assignment: (user, ts_us, tie, session_idx) —
    * session_idx is the 1-based running count of session starts. */
  def assign(events: DataFrame, userCol: String, tsCol: String,
             tieCol: String, gapUs: Long): DataFrame = {
    val byUser = Window.partitionBy("user").orderBy("ts_us", "tie")
    val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // cast first: identity on TIMESTAMP; TIMESTAMP_NTZ (parquet naive
    // timestamps) is interpreted in the session time zone — UTC across
    // this repo's mains, matching DuckDB's naive epoch_us exactly
    events.select(col(userCol).cast("long").as("user"),
        unix_micros(col(tsCol).cast("timestamp")).as("ts_us"),
        col(tieCol).cast("long").as("tie"))
      .withColumn("prev_us", lag("ts_us", 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") >= gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum("is_new").over(cum))
      .drop("prev_us", "is_new")
  }

  /** Per-session summary: (user, session_idx, n_events, start_us,
    * span_us). Reuses `assign`'s user exchange for the aggregate. */
  def summarize(events: DataFrame, userCol: String, tsCol: String,
                tieCol: String, gapUs: Long): DataFrame =
    assign(events, userCol, tsCol, tieCol, gapUs)
      .groupBy("user", "session_idx")
      .agg(count(lit(1)).as("n_events"),
        min("ts_us").as("start_us"),
        (max("ts_us") - min("ts_us")).as("span_us"))
}
