package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-domain quality calibration — convert a raw quality score into a
  * WITHIN-DOMAIN percentile rank and threshold on that. A single global
  * cutoff on a raw score silently biases the kept mix: domains whose
  * scorer runs hot (long encyclopedic pages) crowd out domains whose
  * scorer runs cold (forums, non-Latin scripts) — the documented failure
  * mode quality-classifier pipelines correct by calibrating per stratum
  * (the per-language thresholds of CCNet, Wenzek et al. 2020 §4.3).
  *
  * `pr = percent_rank() = (rank − 1)/(n − 1)` over (score DESC, id)
  * within the domain — pr is the fraction of the domain ranked strictly
  * better, the id tiebreak makes ranks total and deterministic, and the
  * metric is one exact-integer division (bit-identical cross-engine, no
  * rounding contract; quantize-once). keep = pr ≤ q, retaining the top
  * q fraction of EVERY domain by construction.
  *
  * Scale: ONE exchange keyed on the domain column; the rank is a running
  * in-partition pass. Domain skew is real (one language can be half the
  * corpus) — for a pathological mega-domain, pre-aggregate score
  * histograms per domain instead; at typical domain cardinalities the
  * plain window wins.
  */
object Calibrate {

  /** Annotate each row with its within-domain top-percentile rank of
    * `scoreCol` and the keep verdict for the top-`q` cut. Singleton
    * domains (n = 1) define pr = 0 — rank semantics' 0/0 guard — so they
    * are kept for any q > 0 (a lone-language domain is never silently
    * dropped). */
  def percentile(df: DataFrame, domainCol: String, scoreCol: String,
                 idCol: String, q: Double): DataFrame = {
    require(q > 0 && q <= 1, "q in (0, 1]")
    val w = Window.partitionBy(domainCol).orderBy(col(scoreCol).desc, col(idCol).asc)
    df.withColumn("pr", percent_rank().over(w))
      .withColumn("keep", col("pr") <= lit(q))
  }
}
