package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Temperature-based domain rebalancing — the mixture step training-data
  * pipelines run after cleaning: flatten a skewed domain distribution
  * toward p_d ∝ n_d^α (α = 1 natural, α = 0 uniform; the "temperature"
  * knob of the multilingual-sampling recipe in Conneau & Lample 2019 and
  * the Pile/ROOTS mixture builds). Achieved by a per-doc keep
  * probability q_d = (n_min/n_d)^(1−α) — the smallest domain keeps
  * everything, larger domains downsample by their size ratio — so the
  * kept corpus follows the target law without ever shuffling documents.
  *
  * DETERMINISTIC: the keep decision compares the doc's md5-top-64
  *63-bit uniform (scaled to [0,1] by an exact power-of-two division)
  * against q_d — a re-run keeps the identical subset, and the whole
  * decision replays in DuckDB (gate ★ q_mix, hash-exact). For α = 0.5
  * the threshold is sqrt(n_min/n_d): IEEE sqrt and division are
  * correctly rounded in BOTH engines, so the cross-engine thresholds are
  * bit-identical (no rounding contract needed — the documented
  * quantize-once discipline). Other α go through pow(), which is ≤1 ulp
  * but not guaranteed identical — fine for production, but gates should
  * pin α = 0.5.
  *
  * 100 TB: ONE aggregation over the domain column (|domains| rows — a
  * broadcast), then a narrow filter; the corpus itself never shuffles.
  */
object Mix {

  private val Two63 = 9.223372036854775808e18 // 2^63, exact as a double

  /** (dom, n_d, keep_p) — one row per domain. */
  def probs(df: DataFrame, domainCol: Column, alpha: Double): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1]: $alpha")
    val counts = df.groupBy(domainCol.as("dom")).agg(count(lit(1)).as("n_d"))
    val nMin = counts.agg(min("n_d").as("n_min"))
    val ratio = col("n_min").cast("double") / col("n_d").cast("double")
    val keep = if (alpha == 0.5) sqrt(ratio) else pow(ratio, lit(1.0 - alpha))
    counts.crossJoin(broadcast(nMin)).select(col("dom"), col("n_d"),
      keep.as("keep_p"))
  }

  /** Rows of `df` surviving the α-temperature rebalance; selection is a
    * pure function of (idCol, domain counts). */
  def rebalance(df: DataFrame, idCol: Column, domainCol: Column,
                alpha: Double): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val u = graft.functions.GraftFunctions.md5Top64(idCol.cast("string"))
      .bitwiseAND(lit(Long.MaxValue)).cast("double") / lit(Two63)
    // internal names: the caller's frame may itself have a `dom` column
    val p = probs(df, domainCol, alpha)
      .select(col("dom").as("__mix_dom"), col("keep_p").as("__mix_p"))
    df.join(broadcast(p), domainCol === col("__mix_dom"))
      .where(u < col("__mix_p"))
      .drop("__mix_dom", "__mix_p")
  }
}
