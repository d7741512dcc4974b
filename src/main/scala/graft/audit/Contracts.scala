package graft.audit

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality contracts — the Deequ-style "unit tests for
  * data" gate (Schelter et al., VLDB 2018: Automating Large-Scale Data
  * Quality Verification) every production corpus build runs before
  * training sees a byte: completeness, key uniqueness, value bounds,
  * cross-column consistency, domain membership.
  *
  * The whole suite evaluates in ONE aggregation over the corpus — every
  * check is an aggregate expression inside the same `agg(...)`, so Spark
  * computes them all in a single scan with map-side partial combine
  * (uniqueness's `count_distinct` adds its internal expand, still the
  * same single pass over the data). The one wide result row is then
  * unpivoted driver-free with `stack`. Zero UDFs, zero extra jobs; at
  * 100 TB the suite costs exactly one read of the table no matter how
  * many checks it carries.
  *
  * Determinism: every metric is `round(exact-int-count / exact-int-count,
  * 6)` — one IEEE-correctly-rounded division of two exact integers, so
  * the value (and therefore the pass verdict, a >= on that value) is
  * bit-identical across engines and partitionings with no float-sum
  * contract (the quantize-once discipline). Failures are a LEDGER (one
  * row per check with the measured metric), never an exception — the
  * caller decides whether a red row aborts the pipeline.
  */
object Contracts {

  /** One contract: `numerator` is an aggregate column counting satisfying
    * rows (or distinct keys); metric = numerator / count(*). */
  final case class Check(name: String, numerator: Column, threshold: Double)

  /** Fraction of rows where `c` is non-null (and non-empty for strings). */
  def completeness(name: String, c: Column, threshold: Double): Check =
    Check(name, sum(when(c.isNotNull && c.cast("string") =!= "", 1L).otherwise(0L)), threshold)

  /** Distinct-key fraction: 1.0 iff `c` is a unique key. EXACT — the
    * right default up to ~10^8 keys; beyond that the internal expand +
    * key shuffle dominates the suite, switch to [[uniquenessApprox]]. */
  def uniqueness(name: String, c: Column, threshold: Double): Check =
    Check(name, count_distinct(c), threshold)

  /** Approximate distinct-key fraction via HyperLogLog++
    * (`approx_count_distinct`, relative error `rsd`): keeps the suite a
    * bounded-memory single pass at 10^9+ keys where the exact form's
    * expand/shuffle of every key is the dominant cost. Deterministic for
    * a given dataset (register max-merge is order-independent across
    * partitionings) but not cross-engine-replicable — pin it with specs,
    * not the DuckDB oracle; set `threshold` below 1 − 2·rsd. */
  def uniquenessApprox(name: String, c: Column, threshold: Double,
                       rsd: Double = 0.05): Check =
    Check(name, approx_count_distinct(c, rsd), threshold)

  /** Fraction of rows with `lo <= c <= hi` (nulls fail). */
  def bounds(name: String, c: Column, lo: Long, hi: Long, threshold: Double): Check =
    Check(name, sum(when(c.between(lo, hi), 1L).otherwise(0L)), threshold)

  /** Fraction of rows satisfying an arbitrary row predicate (nulls fail) —
    * the cross-column consistency form, e.g. `n_chars === length(text)`. */
  def satisfies(name: String, predicate: Column, threshold: Double): Check =
    Check(name, sum(when(predicate, 1L).otherwise(0L)), threshold)

  /** Fraction of rows whose `c` is one of `allowed`. */
  def inDomain(name: String, c: Column, allowed: Seq[String], threshold: Double): Check =
    Check(name, sum(when(c.isin(allowed: _*), 1L).otherwise(0L)), threshold)

  /** Run the suite: one row per check — (chk, metric, threshold, pass).
    * ("chk", not "check": CHECK is reserved in ANSI SQL engines.) */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame =
    runBy(df, Nil, checks)

  /** Stratified suite: one row per (group, check) — the per-domain /
    * per-source quality report. Same single pass; the aggregate is keyed
    * on the group columns (one |groups|-sized exchange of partial rows). */
  def runBy(df: DataFrame, groupCols: Seq[String], checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "empty contract suite")
    // names are spliced into a stack() SQL string — keep them identifiers
    checks.foreach(c => require(c.name.matches("[A-Za-z0-9_]+"),
      s"check name must be [A-Za-z0-9_]+: '${c.name}'"))
    require(checks.map(_.name).distinct.size == checks.size, "duplicate check names")
    val metrics = checks.map(c =>
      round(c.numerator.cast("double") / count(lit(1)), 6).as(c.name))
    val row = df.groupBy(groupCols.map(col): _*)
      .agg(metrics.head, metrics.tail: _*)
    val stackArgs = checks
      .map(c => s"'${c.name}', `${c.name}`, CAST(${c.threshold} AS DOUBLE)")
      .mkString(", ")
    row.select(groupCols.map(col) :+ expr(
        s"stack(${checks.length}, $stackArgs) AS (chk, metric, threshold)"): _*)
      .withColumn("pass", col("metric") >= col("threshold"))
  }
}
