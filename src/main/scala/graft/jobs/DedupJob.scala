package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.{ExactDedup, MinHash}

/** Corpus-wide dedup stage between extraction and indexing: exact
  * keep-first on content hash (D2/F3 — the reference's seen_files registry,
  * src/services/RAG/convert_to_embeddings.py:559-570), then MinHash-LSH
  * near-dup removal (D3, north-star requirement).
  *
  * Input: the extracted-docs relation (url, text). Output: the cleaned
  * relation plus a `dropped` relation carrying (url, reason, duplicate_of)
  * so lineage survives — losers are recorded, not silently erased,
  * mirroring the reference's metadata-only dup rows.
  */
object DedupJob {

  final case class Result(clean: DataFrame, dropped: DataFrame)

  /** `drops`: optional observation wired through to the MinHash bucket cap
    * (dropped_members/overflow_buckets — the skip ledger; see
    * MinHash.nearDupPairs for the absence-means-zero reading rule). */
  def run(spark: SparkSession, docs: DataFrame,
          urlCol: String = "url", textCol: String = "text",
          jaccardThreshold: Double = 0.8,
          drops: Option[org.apache.spark.sql.Observation] = None): Result = {
    // D2: exact content dedup, keep-first by url
    val hashed = docs.withColumn("content_hash", sha2(col(textCol).cast("binary"), 256))
    val annotated = ExactDedup.annotate(hashed, col("content_hash"), col(urlCol))
    val exactClean = annotated.filter(!col("is_duplicate"))
      .drop("is_duplicate", "duplicate_of", "content_hash")
    val exactDropped = annotated.filter(col("is_duplicate"))
      .select(col(urlCol).as("url"), lit("exact_duplicate").as("reason"),
        col("duplicate_of").cast("string").as("duplicate_of"))

    // D3: near-dup over the exact-clean survivors — verified pairs clustered
    // into true connected components (chains A~B~C with A≁C keep exactly
    // one doc), each component's min-id root wins; losers' duplicate_of is
    // the root, not an arbitrary pair partner
    val rawPairs = MinHash.nearDupPairs(exactClean, urlCol, textCol, jaccardThreshold,
      drops = drops)
    // When the caller asked for the drops ledger, fire it with its OWN
    // action before the pairs get embedded in Components.of's distinct/join
    // pipeline: if Jaccard verification empties the pair set while buckets
    // overflowed, AQE empty-relation propagation could cull the
    // CollectMetrics node from the larger plan and the absence-means-zero
    // read would return 0 despite real drops (the rule documented in
    // MinHash.nearDupPairs). localCheckpoint is eager — the ledger fires
    // here — and as a bonus the expensive verify lineage (referenced twice
    // by the edges union) is materialized once instead of re-derived.
    val pairs = if (drops.isDefined) rawPairs.localCheckpoint() else rawPairs
    val comps = graft.dedup.Components.of(pairs)
    val losers = comps.filter(col("id") =!= col("comp"))
      .select(col("id").as("loser"), col("comp").as("duplicate_of"))
    val nearClean = exactClean.join(losers,
      exactClean(urlCol).cast("string") === losers("loser"), "left_anti")
    val nearDropped = losers.select(col("loser").as("url"),
      lit("near_duplicate").as("reason"), col("duplicate_of"))

    Result(nearClean, exactDropped.unionByName(nearDropped))
  }
}
