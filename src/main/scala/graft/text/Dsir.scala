package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
  * 2023 — published method, public knowledge): select raw-corpus examples
  * whose hashed-n-gram distribution resembles a target domain, the
  * domain-matching step of modern pretraining mixes (the learned cousin of
  * [[Sampling]]'s fixed per-stratum rates).
  *
  *   1. FEATURES — each doc is a bag of hashed n-grams: unigrams + bigrams
  *      of the engine's shared lowercase-alphanumeric tokenizer
  *      ([[graft.index.Bm25.tokensCol]]), md5-top-64 into `buckets`
  *      buckets (the engine-wide oracle-replicable hash).
  *   2. FIT — smoothed bag-of-ngrams models on target and raw; per-bucket
  *      importance log-ratio lr[b] = ln p_t(b) − ln p_r(b), add-α.
  *   3. SCORE — per-doc log importance weight Σ_b count_b · lr[b].
  *   4. RESAMPLE — Gumbel top-k: key = logweight + g(id), g = −ln(−ln u).
  *      The published algorithm draws u i.i.d.; here u is a DETERMINISTIC
  *      md5-derived uniform, so a re-run selects the identical subset —
  *      the engine-wide reproducibility discipline, and what makes the
  *      operator oracle-checkable end-to-end.
  *
  * CROSS-ENGINE FLOAT CONTRACT: quantize ONCE, at the end — never at
  * intermediate tables. An earlier revision rounded lr to 6 dp at fit
  * time; that placed ~4096 independent ln-derived values each at a
  * rounding boundary, and any bucket whose unrounded lr straddled a
  * .5e-6 boundary flipped between engines (libm ln differs by ulps),
  * shifting Σ cnt·lr by cnt·1e-6 — large enough to flip the 4-dp
  * logweight of every doc whose sum sat near its own boundary (observed:
  * 2/100 rows at sf0.001). Raw-double lr keeps cross-engine diffs at ulp
  * scale (~1e-13 after the sum), 9 orders below the 4-dp quantum, and the
  * sum itself is order-stable to the same scale. The uniform is
  * mapped onto (0.25, 0.75), the band where −ln(−ln u) is well-conditioned
  * (u→1 makes the inner log catastrophically cancel: a 1-ulp ln difference
  * there moves the Gumbel by ~1e-10, enough to flip a 6-dp rounding).
  * A truncated noise band reweights the tail of the Gumbel draw; for a
  * deterministic selection rule that is a documented design dial, not a
  * correctness loss.
  *
  * Plan shape (for a 100 TB raw corpus): fit = one explode + hash
  * aggregate per corpus (map-side partials) down to ≤`buckets` rows each,
  * joined bucket-on-bucket — the model is a few-thousand-row table.
  * score = explode + (doc,bucket) aggregate + BROADCAST join against that
  * tiny model + per-doc aggregate: two shuffles, both keyed on the
  * high-cardinality doc id. resample = orderBy+limit =
  * TakeOrderedAndProject (per-partition top-k, no global sort).
  */
object Dsir {

  /** One row per n-gram occurrence: (doc, bucket). Unigrams + bigrams,
    * md5-top-64 masked to 63 bits, mod `buckets`. */
  def gramBuckets(docs: DataFrame, idCol: String, textCol: String,
                  buckets: Int): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val tk = graft.index.Bm25.tokensCol(col(textCol))
    val withTk = docs.select(col(idCol).cast("string").as("doc"), tk.as("tk"))
    // bigrams: zip tokens with their successors; the null-padded tail pair
    // concats to null and is filtered out
    val bi = filter(
      zip_with(col("tk"),
        slice(col("tk"), lit(2), greatest(size(col("tk")) - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b)),
      g => g.isNotNull)
    val grams = withTk
      .select(col("doc"), explode(concat(col("tk"), bi)).as("gram"))
    grams.select(col("doc"),
      pmod(graft.functions.GraftFunctions.md5Top64(col("gram"))
        .bitwiseAND(lit(Long.MaxValue)), lit(buckets.toLong)).as("bucket"))
  }

  /** Per-bucket importance log-ratio table (bucket, lr), lr RAW double
    * (quantize-once contract — see class doc) — one row per bucket
    * observed in the RAW corpus (target-only buckets cannot occur when
    * target ⊆ raw, the DSIR setting). ≤`buckets` rows: broadcastable by
    * construction. */
  def fit(target: DataFrame, raw: DataFrame, textCol: String,
          buckets: Int, alpha: Double = 0.5): DataFrame = {
    // each count table is consumed TWICE (the bucket join + its own total
    // aggregate) and the two consumers prune differently, so without a
    // materialization the gram explode+hash re-runs per consumer (the
    // per-branch-pruning fork — plan-audited: 5 corpus scans in the final
    // plan). The RAW side is the full corpus, so its ≤`buckets`-row
    // aggregate is checkpointed (one corpus explode instead of two; the
    // table is tiny, the explode is the operator's dominant scan). The
    // TARGET side is the domain sample — small by the DSIR setting — and
    // stays inline: its duplicated explode costs less than serializing a
    // third eager job before the scoring action.
    def counts(df: DataFrame, name: String) =
      gramBuckets(df.withColumn("__id", lit("_")), "__id", textCol, buckets)
        .groupBy("bucket").agg(count(lit(1)).cast("double").as(name))
    val tc = counts(target, "nt")
    val rc = counts(raw, "nr").localCheckpoint()
    val denom = lit(alpha) * buckets
    val tTot = tc.agg(sum("nt").as("t_total"))
    val rTot = rc.agg(sum("nr").as("r_total"))
    rc.join(tc, Seq("bucket"), "left")
      .crossJoin(broadcast(tTot)).crossJoin(broadcast(rTot))
      .select(col("bucket"),
        (log((coalesce(col("nt"), lit(0.0)) + alpha) / (col("t_total") + denom)) -
          log((col("nr") + alpha) / (col("r_total") + denom))).as("lr"))
  }

  /** (doc, n_grams, logweight): logweight = Σ count_b · lr[b], rounded
    * 4 dp. Docs with zero grams have no distribution to score and are
    * absent (a caller gating on DSIR should pre-drop empties — the quality
    * gate already does). Buckets missing from `model` contribute 0 (an
    * inner join): with target ⊆ raw every raw bucket is modeled, so this
    * only affects scoring NEW text against an old model — the published
    * estimator's behavior for unseen features. */
  def score(docs: DataFrame, idCol: String, textCol: String,
            model: DataFrame, buckets: Int): DataFrame =
    gramBuckets(docs, idCol, textCol, buckets)
      .groupBy("doc", "bucket").agg(count(lit(1)).cast("double").as("cnt"))
      .join(broadcast(model), Seq("bucket"))
      .groupBy("doc")
      .agg(sum("cnt").cast("long").as("n_grams"),
        round(sum(col("cnt") * col("lr")), 4).as("logweight"))

  /** Deterministic Gumbel top-k over scored docs: key = logweight + g,
    * g = −ln(−ln u), u = md5-uniform on (0.25, 0.75) (see class doc for
    * why the band). Ties break to the smaller doc id. orderBy+limit →
    * TakeOrderedAndProject. */
  def resample(scored: DataFrame, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(scored.sparkSession)
    val u = (pmod(graft.functions.GraftFunctions.md5Top64(col("doc"))
      .bitwiseAND(lit(Long.MaxValue)), lit(1000000L)).cast("double") + 0.5) /
      2000000.0 + 0.25
    scored
      .withColumn("gumbel", round(-log(-log(u)), 6))
      .withColumn("key", round(col("logweight") + col("gumbel"), 4))
      .orderBy(desc("key"), asc("doc"))
      .limit(k)
  }
}
