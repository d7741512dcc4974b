package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust per-domain outlier trimming — median/MAD gating of a numeric
  * signal (length, token count), the statistical form of the fixed-bound
  * length rules in published pipeline filters: mean/stddev are themselves
  * dragged by the outliers they should catch (one 100 MB page shifts a
  * domain's mean), while median and MAD (median absolute deviation,
  * Hampel's robust scale) have a 50% breakdown point — half a domain can
  * be garbage and the gate still stands.
  *
  * keep = |x − med_d| ≤ c·mad_d, computed per domain. Exactness: inputs
  * are integers; Spark's `percentile` and DuckDB's `quantile_cont` share
  * the same linear-interpolation definition, so medians are exact
  * doubles (integers or integer-halves) and every derived comparison is
  * bit-identical cross-engine — no rounding contract (quantize-once).
  *
  * Plan: two tiny domain aggregates (median, then MAD over the joined
  * deviations) broadcast back; the corpus itself never shuffles — the
  * Mix.scala shape with one extra round. Exact percentile sorts each
  * domain group inside the aggregate: fine to ~10^8 rows/domain; for a
  * pathological mega-domain swap `percentile` for `percentile_approx`
  * (same plan, documented accuracy trade). MAD = 0 (>50% of the domain
  * at one value) degrades to keeping exactly the median value — the
  * mathematically honest reading of "no robust scale exists".
  */
object Outliers {

  /** Annotate each row with its domain's median/MAD of `scoreCol` and the
    * keep verdict for the `c`-MAD band. */
  def madGate(df: DataFrame, domainCol: String, scoreCol: String,
              c: Double): DataFrame = {
    require(c > 0, "c must be positive")
    val sc = s"`$scoreCol`" // backtick-quote: the name is spliced into SQL
    val med = df.groupBy(domainCol)
      .agg(expr(s"percentile($sc, 0.5)").as("med"))
    val withMed = df.join(broadcast(med), domainCol)
    val mad = withMed.groupBy(domainCol)
      .agg(expr(s"percentile(abs($sc - med), 0.5)").as("mad"))
    withMed.join(broadcast(mad), domainCol)
      .withColumn("keep", abs(col(scoreCol) - col("med")) <= lit(c) * col("mad"))
  }
}
