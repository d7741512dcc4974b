package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shingle CONTAINMENT detection (Broder 1997, "On the resemblance and
  * containment of documents") — the ASYMMETRIC companion to Jaccard
  * near-dup: C(A,B) = |S(A) ∩ S(B)| / |S(A)| finds a document wholly (or
  * mostly) included inside another — quoted articles, page-within-page
  * aggregators, boilerplate wrappers around syndicated bodies. Jaccard
  * misses exactly these: a 100-word doc inside a 10,000-word container has
  * J ≈ 0.01 but C = 1.0, so the resemblance family (MinHash/SimHash/
  * n-gram) never surfaces the pair.
  *
  * Eighth member of the dedup family (exact, MinHash-LSH, SimHash, n-gram
  * Jaccard, paragraph, substring, fuzzy, semantic — and now containment).
  *
  * Plan shape (inverted-index pair counting):
  *   1. one narrow flatMap per doc → per-doc DISTINCT shingle hashes
  *      (dedup inside the closure — no distinct shuffle), each row carrying
  *      the doc's set size `n` (constant per doc, RLE-cheap);
  *   2. one hash-keyed aggregate counts document frequency per shingle;
  *      shingles with df > maxDf are CUT before pairing — the published
  *      common-shingle removal trade (Broder's super-shingle rationale): a
  *      boilerplate shingle in 10^6 docs would alone emit 10^12/2 pairs,
  *      the cap bounds per-shingle fanout at maxDf²/2. The cut is
  *      OBSERVABLE (dropped shingle keys + dropped occurrence rows ride an
  *      `Observation`), never silent. Recall trade, stated precisely: the
  *      denominator |S(A)| KEEPS cut shingles, so every corpus-hot shingle
  *      a doc carries deflates its computed C — a true containment is
  *      missed once more than (1−tau) of the contained doc's shingles are
  *      hot, even if all its surviving shingles are shared. Size maxDf (or
  *      lower tau) against the corpus's boilerplate profile;
  *   3. the self-join on the surviving shingle key + one (a,b) aggregate
  *      with map-side partials → exact intersection sizes;
  *   4. verdict: direction points at the SMALLER set (tie → larger id);
  *      emit when C = inter / n_small ≥ tau.
  *
  * Exactness contract: intersection and set sizes are integers; the single
  * division is correctly rounded (identical bits on any IEEE engine), the
  * threshold compares that unrounded double, and the output quantizes ONCE
  * at 6 dp — hash-exact vs a SQL replica on any partitioning.
  */
object Containment {

  /** (contained_id, container_id, containment) for every unordered
    * candidate pair whose smaller shingle set is covered ≥ tau by the
    * other. Docs with no shingles (empty text) never pair. */
  def pairs(spark: SparkSession, docs: DataFrame, idCol: String, textCol: String,
            tau: Double = 0.9, maxDf: Int = 64,
            drops: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    import spark.implicits._
    require(tau > 0 && tau <= 1, s"tau $tau")
    require(maxDf >= 2, s"maxDf $maxDf — pairs need df >= 2")
    // materialized ONCE (localCheckpoint): the shingle relation is consumed
    // by its own df aggregate AND the kept join (plus the optional drop
    // ledger), and the consumers prune it differently — without a
    // materialization the flatMap (and whatever harness lineage feeds it)
    // re-runs per consumer (the per-branch-pruning fork). One row per
    // distinct (doc, shingle) — token-stream-class, the same size the
    // pair join shuffles anyway.
    val sh = docs
      .select(col(idCol).cast("string").as("id"),
        coalesce(col(textCol).cast("string"), lit("")).as("text"))
      .as[(String, String)]
      .flatMap { case (id, text) =>
        val set = new scala.collection.mutable.HashSet[Long]
        MinHash.shingles(text).foreach(set += _)
        val n = set.size
        set.iterator.map(h => (id, h, n))
      }.toDF("id", "h", "n")
      .localCheckpoint()
    val dfc = sh.groupBy("h").agg(count(lit(1)).as("df"))
    // The drop ledger fires as its OWN bounded action (the DedupJob
    // discipline): drops > 0 does NOT force surviving pairs here, so if the
    // pair join comes back empty AQE's empty-relation propagation would
    // cull a lazily-embedded CollectMetrics node and the Observation would
    // read empty exactly when it matters most. Cost: one extra map-side-
    // partial pass over the shingle relation, only when observability is
    // requested.
    drops.foreach { o =>
      dfc.observe(o,
          coalesce(sum(when(col("df") > maxDf, 1L).otherwise(0L)), lit(0L))
            .as("dropped_shingles"),
          coalesce(sum(when(col("df") > maxDf, col("df")).otherwise(0L)), lit(0L))
            .as("dropped_rows"))
        .foreach(_ => ())
    }
    val kept = sh.join(dfc.where(col("df") <= maxDf).select("h"), Seq("h"))
    val inter = kept.select(col("h"), col("id").as("id_a"), col("n").as("n_a"))
      .join(kept.select(col("h"), col("id").as("id_b"), col("n").as("n_b")), Seq("h"))
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "n_a", "n_b")
      .agg(count(lit(1)).as("inter"))
    val aContained = col("n_a") < col("n_b") // else (incl. ties) the larger id is contained
    inter
      .select(
        when(aContained, col("id_a")).otherwise(col("id_b")).as("contained_id"),
        when(aContained, col("id_b")).otherwise(col("id_a")).as("container_id"),
        (col("inter").cast("double") / least(col("n_a"), col("n_b"))).as("c"))
      .where(col("c") >= tau)
      .select(col("contained_id"), col("container_id"),
        round(col("c"), 6).as("containment"))
  }
}
