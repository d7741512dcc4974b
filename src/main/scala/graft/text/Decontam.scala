package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag corpus documents that share word n-grams
  * with an evaluation/benchmark set, so training corpora can be scrubbed of
  * test-set leakage (the published n-gram overlap procedure of GPT-3
  * appendix C / Dolma / FineWeb; 13-gram collision is the classic cut).
  *
  * Scale shape (the whole point of the operator): the BENCHMARK side is
  * tiny relative to the corpus — full eval suites are ~10^6–10^7 distinct
  * n-grams ≈ tens of MB of 8-byte hashes — so it broadcasts, and the
  * 10^12-doc corpus side never shuffles a single n-gram row: one narrow
  * flatMap emits (id, gram-hash), a broadcast left join marks hits, and the
  * only exchange is the per-doc count aggregation (map-side partial, key =
  * the high-cardinality doc id). `.explain` shows exactly one
  * BroadcastHashJoin and one Exchange.
  *
  * Word model and hashing are shared with MinHash (lower / [^a-z0-9]+ /
  * md5-top-64) so the gram stream is replicable in any SQL engine — the
  * driver oracle (q_decontam) recomputes both sides in DuckDB exactly.
  */
object Decontam {

  /** Distinct md5-top-64 hashes of the word n-grams of `text`. Mirrors
    * MinHash.shingles semantics at arbitrary n: texts shorter than n tokens
    * hash their whole token string as a single gram; empty → none. */
  def gramHashes(text: String, n: Int): Array[Long] = {
    val toks = graft.dedup.MinHash.tokenize(text)
    if (toks.length < n) {
      if (toks.isEmpty) Array.empty
      else Array(graft.Hashing.md5Long(toks.mkString(" ")))
    } else {
      val out = new Array[Long](toks.length - n + 1)
      var i = 0
      while (i <= toks.length - n) {
        val sb = new StringBuilder
        var k = 0
        while (k < n) { if (k > 0) sb.append(' '); sb.append(toks(i + k)); k += 1 }
        out(i) = graft.Hashing.md5Long(sb.toString)
        i += 1
      }
      out.distinct
    }
  }

  /** Per-document contamination report against `bench`:
    * (id, n_grams, hits, contaminated) where `n_grams` counts the doc's
    * distinct word n-grams, `hits` how many of those appear anywhere in the
    * benchmark set, and `contaminated` = hits ≥ minHits (the classic rule is
    * minHits = 1: any shared n-gram disqualifies). Docs with no grams
    * (empty text) report (0, 0, false). */
  def flag(docs: DataFrame, idCol: String, textCol: String,
           bench: DataFrame, benchTextCol: String,
           n: Int = 13, minHits: Long = 1L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val gramN = n // local copies only — a closure over `this` would
    // serialize the enclosing object (CLAUDE.md closure-capture rule)

    // one row per (doc, distinct gram); gram-less docs emit a null-gram row
    // so they survive the aggregation with zero counts
    val docGrams = docs
      .select(col(idCol).cast("string").as("id"), col(textCol).as("t"))
      .as[(String, String)]
      .flatMap { case (id, t) =>
        val gs = gramHashes(if (t == null) "" else t, gramN)
        if (gs.isEmpty) Iterator.single((id, None: Option[Long]))
        else gs.iterator.map(g => (id, Some(g)))
      }.toDF("id", "g")

    // distinct benchmark grams: the small, broadcastable side
    val benchSet = bench.select(col(benchTextCol).as("t")).as[String]
      .flatMap(t => gramHashes(if (t == null) "" else t, gramN).iterator)
      .distinct().toDF("bg")

    docGrams.join(broadcast(benchSet), docGrams("g") === benchSet("bg"), "left")
      .groupBy("id")
      .agg(count(col("g")).as("n_grams"), count(col("bg")).as("hits"))
      .withColumn("contaminated", col("hits") >= minHits)
  }
}
