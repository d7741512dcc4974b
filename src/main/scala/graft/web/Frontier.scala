package graft.web

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Politeness-scheduled crawl frontier — the per-host queue discipline of
  * the Mercator crawler (Heydon & Najork, WWW 1999) every polite fetcher
  * implements: a host serves at most one fetch per `delayMs`, higher
  * priority first, and the global schedule is nothing more than per-host
  * spacing laid over per-host priority order (hosts are independent — the
  * embarrassing parallelism crawling actually has).
  *
  * slot = per-host rank − 1 under `(priority DESC, url)` — a TOTAL integer
  * order, so the schedule is a pure function of the frontier (bit-equal on
  * any engine/partitioning, no float contract); fetch_at_ms = slot ·
  * delayMs, an epoch-relative offset the fetch loop adds to its start
  * time. `maxPerHost` caps each host's horizon (the frontier-politeness
  * budget: a 10⁸-url host cannot monopolize the frontier) — urls ranked
  * past the cap are EXCLUDED, and because the rank filter sits directly
  * above its window this plans as WindowGroupLimit: each host ships at
  * most `maxPerHost` rows out of the rank exchange, map-side truncated.
  *
  * Plan shape: ONE exchange keyed on the raw high-cardinality host (the
  * CLAUDE.md salting rule), a rank window, a narrow projection. */
object Frontier {

  /** (url, host, priority, slot, fetch_at_ms) for every url scheduled
    * within its host's horizon. Null priorities sort last (treated as
    * MIN_VALUE); ties break on the url string. */
  def schedule(df: DataFrame, urlCol: String, hostCol: String,
               priorityCol: String, delayMs: Long,
               maxPerHost: Int = Int.MaxValue): DataFrame = {
    require(delayMs >= 0, s"delayMs $delayMs")
    require(maxPerHost >= 1, s"maxPerHost $maxPerHost")
    val w = Window.partitionBy("host")
      .orderBy(col("priority").desc_nulls_last, col("url"))
    df.select(col(urlCol).cast("string").as("url"),
        col(hostCol).cast("string").as("host"),
        col(priorityCol).cast("long").as("priority"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxPerHost)
      .select(col("url"), col("host"), col("priority"),
        (col("__rn") - 1).cast("long").as("slot"),
        ((col("__rn") - 1) * delayMs).cast("long").as("fetch_at_ms"))
  }
}
