package graft.sketch

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable log-bucket quantile histogram — the distribution summary of
  * the sketch family ([[Hll]] cardinality, [[CountMin]] frequency, [[Kmv]]
  * set similarity): per-key decimal-decade buckets over a non-negative
  * measure (token counts, doc lengths, latencies), from which any
  * percentile is answered with bounded relative error (a bucket spans one
  * leading digit, so the reported bound is within one digit-step of the
  * true quantile — the standard log-histogram guarantee of HdrHistogram /
  * DDSketch, Masson et al. VLDB 2019, restated in decimal).
  *
  * Bucket rule (integer-exact in any engine): v ≤ 0 → 0; else the lower
  * bound of v's leading-digit decade, `lead(v) · 10^(digits(v)−1)`,
  * computed as string surgery (`concat(first_digit, repeat('0', …))`) so
  * NO floating-point log/pow appears anywhere — cross-engine parity is
  * exact by construction, per the engine's quantize-once discipline.
  *
  * MERGE IS LOSSLESS for the sketch: histograms are counter vectors over
  * a fixed bucket domain (≤ 9·19+1 buckets for longs), so shard merge is
  * a vector add — `histogram(A ∪ B) == merge(histogram(A), histogram(B))`
  * exactly, the property that lets 1000 executors sketch independently
  * and a coordinator fold results without re-reading data.
  *
  * Percentile rule: the smallest bucket whose cumulative count reaches
  * `ceil(q/1000 · n)` — i.e. `min lo where cum·1000 ≥ q_milli·n`, all
  * BIGINT arithmetic.
  *
  * Plan shape: `histogram` is ONE hash aggregate over a narrow
  * two-column projection — map-side partial counts collapse each
  * partition to ≤ #buckets rows per key before the exchange, so the
  * shuffle volume is O(keys × 172) regardless of input size.
  * `percentiles` runs entirely over that bounded table (windows + a
  * broadcast cross with the quantile list) — no second pass over data.
  */
object Quantile {

  /** Narrow per-row bucket projection (key, lo, cnt=1) — no aggregate, so
    * it composes under streaming keyed state ([[graft.streaming
    * .StreamExtract.histogramTotals]]) exactly like the HLL/CMS
    * observation feeds. */
  def observations(df: DataFrame, keyCol: String, valCol: String): DataFrame = {
    val v = col(valCol).cast("long")
    df.select(col(keyCol).cast("string").as("key"), v.as("v"))
      .withColumn("lo", when(col("v") <= 0, lit(0L)).otherwise(expr(
        "cast(concat(substring(cast(v as string), 1, 1)," +
          " repeat('0', length(cast(v as string)) - 1)) as bigint)")))
      .select(col("key"), col("lo"), lit(1L).as("cnt"))
  }

  /** Per-key decade histogram: (key, lo, cnt). `valCol` must be castable
    * to a non-negative long (negatives clamp to the 0 bucket). */
  def histogram(df: DataFrame, keyCol: String, valCol: String): DataFrame =
    observations(df, keyCol, valCol)
      .groupBy("key", "lo").agg(sum("cnt").as("cnt"))

  /** Lossless shard merge: vector add over the fixed bucket domain. */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("key", "lo").agg(sum("cnt").as("cnt"))

  /** Per-key percentile bounds from a histogram: for each q (in milli,
    * 500 = median) the smallest bucket lower bound whose cumulative count
    * covers q — (key, q_milli, lo). Runs over the bounded sketch only. */
  def percentiles(hist: DataFrame, qsMilli: Seq[Int]): DataFrame = {
    val spark = hist.sparkSession
    import spark.implicits._
    val byLo = Window.partitionBy("key").orderBy("lo")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perKey = Window.partitionBy("key")
    val qs = qsMilli.map(_.toLong).toDF("q_milli")
    hist
      .withColumn("cum", sum("cnt").over(byLo))
      .withColumn("n", sum("cnt").over(perKey))
      .join(broadcast(qs))
      .filter(col("cum") * 1000 >= col("q_milli") * col("n"))
      .groupBy("key", "q_milli").agg(min("lo").as("lo"))
  }
}
