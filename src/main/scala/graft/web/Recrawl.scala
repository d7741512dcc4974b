package graft.web

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Freshness-driven recrawl scheduling — the change-rate estimator of
  * Cho & Garcia-Molina ("Estimating frequency of change", ACM TOIT'03):
  * given a per-page visit history with a content fingerprint per visit,
  * estimate the page's Poisson change rate from the observed
  * changed/unchanged intervals with the paper's bias-corrected MLE
  *
  *   λ̂ = −ln( (n − X + 0.5) / (n + 0.5) ) / Δ̄
  *
  * where n = consecutive-visit intervals, X = intervals whose
  * fingerprints differ, Δ̄ = mean interval length (seconds). Pages with
  * higher λ̂ are revisited sooner — the scheduling signal a crawler's
  * frontier consumes (the politeness scheduler [[Frontier]] orders
  * WITHIN a host; this orders WHAT is due).
  *
  * Plan: one window shuffle on the page key (lag of fingerprint and
  * timestamp), then a per-page aggregate riding the same partitioning —
  * history length bounds each group, no driver state. Timestamps enter
  * as exact epoch microseconds (integers cross-engine); the only floats
  * are the final ln and divisions, quantized once at 6 dp.
  *
  * Contract: (page, ts) pairs are unique — simultaneous same-page
  * visits have no defined "previous fingerprint". Pages with fewer than
  * 2 visits yield no estimate (no interval to observe).
  */
object Recrawl {

  def changeRates(visits: DataFrame, pageCol: String, tsCol: String,
                  fpCol: String): DataFrame = {
    val us = unix_micros(col(tsCol).cast("timestamp"))
    visits
      .select(col(pageCol).as("page"), us.as("us"), col(fpCol).as("fp"))
      .withColumn("prev_fp", lag("fp", 1).over(
        Window.partitionBy("page").orderBy(col("us"))))
      .withColumn("prev_us", lag("us", 1).over(
        Window.partitionBy("page").orderBy(col("us"))))
      .filter(col("prev_us").isNotNull)
      .groupBy("page")
      .agg(count(lit(1)).as("n"),
        sum(when(col("fp") =!= col("prev_fp"), 1L).otherwise(0L)).as("x"),
        sum(col("us") - col("prev_us")).as("dt_us"))
      .select(col("page"), col("n"), col("x"),
        round(
          -log((col("n").cast("double") - col("x").cast("double") + lit(0.5)) /
               (col("n").cast("double") + lit(0.5))) /
          ((col("dt_us").cast("double") / lit(1e6)) / col("n").cast("double")),
          6).as("lambda"))
  }
}
