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
    // D2: exact content dedup, keep-first by url. Materialized ONCE
    // (localCheckpoint): the annotated relation feeds ≥3 separate actions —
    // the near-dup candidate/verify lineage (via exactClean), the caller's
    // dropped-lineage write (via exactDropped) and every consumer of
    // `clean` (IndexJob.build runs 3 write jobs over it) — and each action
    // re-ran the sha256 + keep-first window over the full corpus without
    // it (guide §5: persist exactly when reused AND expensive to recompute;
    // the 100-TB analog is snapshotting the hashed/annotated corpus table
    // once instead of re-shuffling it per downstream stage).
    val hashed = docs.withColumn("content_hash", sha2(col(textCol).cast("binary"), 256))
    val annotated = ExactDedup.annotate(hashed, col("content_hash"), col(urlCol))
      .localCheckpoint()
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
    // label the eager clustering actions (guide §1.5, diagnostic only)
    spark.sparkContext.setJobDescription("dedup:components")
    val comps = graft.dedup.Components.of(pairs)
    spark.sparkContext.setJobDescription(null)
    val losers = comps.filter(col("id") =!= col("comp"))
      .select(col("id").as("loser"), col("comp").as("duplicate_of"))
    val nearClean = exactClean.join(losers,
      exactClean(urlCol).cast("string") === losers("loser"), "left_anti")
    val nearDropped = losers.select(col("loser").as("url"),
      lit("near_duplicate").as("reason"), col("duplicate_of"))

    Result(nearClean, exactDropped.unionByName(nearDropped))
  }

  private val FpFile = ".*/data/v(\\d+)/fps/.*\\.parquet".r

  /** Lake-backed INCREMENTAL exact dedup — the arrival pattern a 100-TB
    * corpus actually has: batches land over months, and re-running the
    * whole-corpus dedup for every delivery re-shuffles everything seen so
    * far. Instead the lake at `stateRoot` accumulates one (content_hash,
    * url) fingerprint segment per batch; a new batch joins ONLY its own
    * hashes against that state (hash-keyed shuffle join — the fingerprint
    * relation is 72 bytes/doc, ~10% of corpus bytes, and never rewrites),
    * drops rows seen in ANY earlier batch, keep-firsts the remainder
    * within the batch, and appends the survivors' fingerprints as the next
    * segment. Semantics are exactly keep-first over the batch-ordered
    * union: earlier batches always beat later ones, and within a batch the
    * min `urlCol` wins — so a full-corpus re-dedup and the incremental
    * history agree row-for-row (the q_dedup_incr oracle states this as one
    * global window over (batch, url)).
    *
    * Dropped lineage distinguishes `exact_prior_duplicate` (duplicate_of =
    * the surviving url from an earlier batch) from in-batch
    * `exact_duplicate`. Prior wins are decided BEFORE the in-batch window:
    * a batch whose rows match both a prior doc and each other reports
    * every row against the prior survivor.
    *
    * The prior-state join is BLOOM-PRUNED: state grows with the corpus
    * (O(all batches ever)) while each delivery is O(batch), so shuffling
    * the whole fingerprint relation per delivery is the scale cliff. A
    * Bloom filter built over the batch's hashes (one distributed aggregate
    * → one ≤8 MB driver scalar) pre-filters the state scan, so only
    * might-match rows (≈ batch-sized + false positives) reach the
    * exchange. False positives are re-checked by the equi-join itself —
    * results are bit-identical with `bloom = false` (spec-pinned). */
  def incremental(spark: SparkSession, batch: DataFrame, stateRoot: String,
                  urlCol: String = "url", textCol: String = "text",
                  bloom: Boolean = true): Result = {
    val lake = new graft.lake.LakeTable(stateRoot)
    val hashed = batch
      .withColumn("content_hash", sha2(col(textCol).cast("binary"), 256))

    val priorFiles = lake.state.fileVersions.map(_._1).collect {
      case f @ FpFile(_) => f
    }
    def priorState(): DataFrame = {
      val raw = spark.read.parquet(priorFiles: _*).withColumnRenamed("url", "prior_url")
      if (!bloom) return raw
      graft.functions.GraftFunctions.register(spark)
      val n = math.max(batch.count(), 1L)
      val bf = hashed
        .select(graft.functions.GraftFunctions.bloomAgg(
          col("content_hash"), lit(n), lit(n * 16L)).as("bf"))
        .head.getAs[Array[Byte]]("bf")
      // empty batch → BloomFilterAggregate evals to null: nothing can match
      if (bf == null) raw.limit(0)
      else raw.filter(graft.functions.GraftFunctions.bloomMightContain(
        lit(bf), col("content_hash")))
    }
    // prior state is unique per hash (each batch appends only unseen,
    // in-batch-distinct hashes), so the left join cannot fan out
    val withPrior =
      if (priorFiles.isEmpty) hashed.withColumn("prior_url", lit(null).cast("string"))
      else hashed.join(priorState(), Seq("content_hash"), "left")
    val priorDropped = withPrior.filter(col("prior_url").isNotNull)
      .select(col(urlCol).cast("string").as("url"),
        lit("exact_prior_duplicate").as("reason"),
        col("prior_url").as("duplicate_of"))

    val fresh = withPrior.filter(col("prior_url").isNull).drop("prior_url")
    val annotated = graft.dedup.ExactDedup.annotate(
      fresh, col("content_hash"), col(urlCol))
    val inBatchDropped = annotated.filter(col("is_duplicate"))
      .select(col(urlCol).cast("string").as("url"),
        lit("exact_duplicate").as("reason"),
        col("duplicate_of").cast("string").as("duplicate_of"))
    val survivors = annotated.filter(!col("is_duplicate"))
      .drop("is_duplicate", "duplicate_of")

    val v = lake.currentVersion + 1
    survivors.select(col("content_hash"), col(urlCol).cast("string").as("url"))
      .write.mode("overwrite").parquet(s"$stateRoot/data/v$v/fps")
    lake.commit(lake.listParquet(s"$stateRoot/data/v$v"),
      Seq(s"dedup-batch-v$v"), Nil, Map.empty)

    Result(survivors.drop("content_hash"),
      priorDropped.unionByName(inBatchDropped))
  }
}
