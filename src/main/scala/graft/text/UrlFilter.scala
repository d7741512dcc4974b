package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** RefinedWeb-style URL filtering (Penedo et al. 2023 §3.1, itself the
  * public CommonCrawl-pipeline convention): before any content is fetched
  * or extracted, a document is kept or dropped on its URL alone — (1) a
  * curated domain blocklist, (2) a word-score over the URL string. This is
  * the cheapest gate in a 100-TB pipeline (no text touched), so it runs
  * first and must be a narrow map + one broadcast join.
  *
  * Registrable-domain rule (documented simplification of the Public
  * Suffix List, which cannot ship here): host minus a leading `www.`,
  * last two dot-labels. Penalty rule: count of distinct blocklist WORDS
  * occurring as substrings of the lowercased URL — all integer, so the
  * gate replicates exactly in any engine.
  *
  * Plan shape: `annotate` is per-row string ops plus ONE broadcast
  * left-outer join against the (tiny) domain blocklist — zero shuffles of
  * the corpus; the keep decision never materializes dropped rows.
  */
object UrlFilter {

  /** The URL word-score list (neutral stand-in for RefinedWeb's curated
    * soft-blocklist vocabulary; the mechanism, not the lexicon, is the
    * operator). Frozen for oracle parity. */
  val PenaltyWords: Seq[String] = Seq("casino", "torrent", "spam", "winner", "pills")

  /** Host of a scheme://host/path URL. */
  def hostCol(url: Column): Column = regexp_extract(url, "^[a-z]+://([^/]+)", 1)

  /** Registrable domain: host minus leading `www.`, last two labels. */
  def regDomainCol(url: Column): Column = {
    val host = regexp_replace(hostCol(url), "^www\\.", "")
    regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
  }

  /** Count of penalty words appearing in the lowercased URL. */
  def penaltyCol(url: Column): Column = {
    val lowered = lower(url)
    PenaltyWords.map(w => when(lowered.contains(w), 1L).otherwise(0L))
      .reduce(_ + _)
  }

  /** Adds reg_domain / blocked / url_penalty / url_keep to `docs`.
    * `blocklist` is a one-column (`domain`) table of banned registrable
    * domains — broadcast, so the corpus never shuffles. A URL is kept iff
    * its domain is not blocklisted AND its penalty is below `maxPenalty`. */
  def annotate(docs: DataFrame, urlCol: String,
               blocklist: DataFrame, maxPenalty: Int = 2): DataFrame = {
    val dom = blocklist.select(col("domain").cast("string").as("_bl_domain")).distinct()
    docs
      .withColumn("reg_domain", regDomainCol(col(urlCol)))
      .join(broadcast(dom), col("reg_domain") === col("_bl_domain"), "left")
      .withColumn("blocked", col("_bl_domain").isNotNull)
      .drop("_bl_domain")
      .withColumn("url_penalty", penaltyCol(col(urlCol)))
      .withColumn("url_keep", !col("blocked") && col("url_penalty") < maxPenalty)
  }

  /** The gate itself: rows surviving the URL filter. */
  def keep(docs: DataFrame, urlCol: String,
           blocklist: DataFrame, maxPenalty: Int = 2): DataFrame =
    annotate(docs, urlCol, blocklist, maxPenalty)
      .filter(col("url_keep"))
      .drop("reg_domain", "blocked", "url_penalty", "url_keep")
}
