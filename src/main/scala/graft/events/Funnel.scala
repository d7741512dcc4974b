package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered funnel analysis — the other classic clickstream operator
  * beside [[Sessions]]: for an ordered step list (e.g. view → click →
  * purchase), each user's EARLIEST completion chain — t₁ = min ts of
  * step 1, tᵢ = min ts of step i strictly after tᵢ₋₁. A user's
  * steps_completed is the length of the non-null prefix; out-of-order
  * events never count (a purchase before the first view is invisible to
  * step 3). Timestamps are exact BIGINT epoch micros ([[Sessions]]'s
  * convention), so the chain replicates across engines bit-for-bit.
  *
  * Emitted LONG-format — one row per (user, step_idx, step_ts_us)
  * reached — so no nullable wide columns exist; completion counts are a
  * trivial groupBy on top, and a time-boxed funnel (complete within W of
  * t₁) is a trivial filter the caller composes.
  *
  * Plan shape: one narrow projection of the event stream, then per step
  * a (filter → user-keyed aggregate → user-keyed join with the previous
  * step's table). Every shuffle is on the user key, and the reached
  * relation SHRINKS monotonically (the funnel property), so at real
  * drop-offs the later joins take the broadcast path on their own; the
  * event stream itself is scanned once per step with the step's type
  * filter pushed to the scan.
  */
object Funnel {

  /** (user, step_idx, step_ts_us) for every step each user reached, under
    * steps' order. step_idx is 1-based. */
  def earliest(events: DataFrame, userCol: String, typeCol: String,
               tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val base = events.select(col(userCol).cast("long").as("user"),
      col(typeCol).cast("string").as("t"),
      unix_micros(col(tsCol).cast("timestamp")).as("ts_us"))
    var reached = base.filter(col("t") === steps.head)
      .groupBy("user").agg(min("ts_us").as("step_ts_us"))
    val out = Seq.newBuilder[DataFrame]
    out += reached.select(col("user"), lit(1L).as("step_idx"), col("step_ts_us"))
    steps.zipWithIndex.drop(1).foreach { case (st, i) =>
      reached = base.filter(col("t") === st)
        .join(reached.select(col("user"), col("step_ts_us").as("prev_us")), "user")
        .filter(col("ts_us") > col("prev_us"))
        .groupBy("user").agg(min("ts_us").as("step_ts_us"))
      out += reached.select(col("user"), lit(i + 1L).as("step_idx"), col("step_ts_us"))
    }
    out.result().reduce(_ unionByName _)
  }

  /** Per-user depth: (user, steps_completed). */
  def depth(events: DataFrame, userCol: String, typeCol: String,
            tsCol: String, steps: Seq[String]): DataFrame =
    earliest(events, userCol, typeCol, tsCol, steps)
      .groupBy("user").agg(max("step_idx").as("steps_completed"))
}
