package graft.events

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling (moving-window) aggregates over a keyed event stream — the
  * per-user trailing-k and trailing-interval statistics behind rate
  * limiting, anomaly flags and engagement features.
  *
  * Two frame shapes, both exact SQL window frames:
  *   - `lastK`: ROWS (k−1) PRECEDING .. CURRENT — the "last k events"
  *     statistic, tie-broken deterministically by (ts, id);
  *   - `lastInterval`: RANGE on exact BIGINT epoch micros — the "last
  *     hour" statistic; the frame bound is integer arithmetic, so frame
  *     membership is identical across engines (no timestamp rounding).
  *
  * Scale: ONE exchange keyed on the raw high-cardinality key serves
  * every window (key ⊆ all partition specs — the q_sessions discipline);
  * frames evaluate in a running in-partition pass, never materializing
  * the window contents. Quantize-once: sums round(…, 4) at the OUTPUT
  * only; each frame sums ≤ k doubles so cross-engine drift is ~1e-13,
  * nine orders under the output quantum.
  */
object Rolling {

  /** Per-key trailing statistics: for each event, the count and sum of
    * `value` over the last `k` events (rows frame) and the count over the
    * trailing `intervalUs` (range frame on epoch micros; equal-ts peers
    * are all in-frame, so tie order can't change the result). */
  def stats(events: DataFrame, keyCol: String, tsCol: String, idCol: String,
            valueCol: String, k: Int, intervalUs: Long): DataFrame = {
    require(k > 0 && intervalUs > 0, "k and intervalUs must be positive")
    val rows = Window.partitionBy(keyCol)
      .orderBy(col("ts_us").asc, col(idCol).asc)
      .rowsBetween(-(k - 1).toLong, Window.currentRow)
    val range = Window.partitionBy(keyCol)
      .orderBy(col("ts_us").asc)
      .rangeBetween(-intervalUs, Window.currentRow)
    events
      .select(col(keyCol), unix_micros(col(tsCol).cast("timestamp")).as("ts_us"),
        col(idCol), col(valueCol))
      .withColumn("cnt_k", count(lit(1)).over(rows))
      .withColumn("sum_k", round(sum(valueCol).over(rows), 4))
      .withColumn("cnt_win", count(lit(1)).over(range))
      .drop(valueCol)
  }
}
