package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trainable bigram language model with add-one smoothing — the
  * word-ORDER-aware counterpart of [[Vocab.lmScore]]'s unigram corpus LM
  * and the from-scratch analog of CCNet's KenLM perplexity filter
  * (Wenzek et al. 2019): train n-gram counts on a reference split, score
  * held-out documents by conditional log-likelihood, gate on the score.
  * Where the unigram LM sees a bag of words, this one scores each token
  * GIVEN its predecessor — scrambled or machine-generated text with
  * plausible word frequencies but implausible transitions scores low.
  *
  *   P(w | u) = (c2(u,w) + 1) / (c1(u) + V)     V = |training vocab|
  *   score(doc) = Σ_{(u,w) pairs, u ∈ vocab} ln P(w | u)
  *
  * Pairs whose CONTEXT u is outside the training vocabulary are skipped
  * (the multinomial OOV convention NaiveBayes also uses — c1(u) is
  * undefined there); an unseen continuation w is what the add-one mass
  * is for. A doc with no scorable pair emits no row.
  *
  * Plan shape: bigrams are built WITHIN each document by indexing the
  * token array against its own tail (the Collocations transform — one
  * narrow explode, pairs never cross documents, NO lag window and its
  * doc-keyed shuffle). Training is two count aggregates; scoring is two
  * equi-joins keyed on the words — left as shuffle joins on purpose: a
  * web-scale bigram table is unbounded (compose with top-V vocabulary
  * induction, q_vocab, to bound it; AQE broadcasts when a trained model
  * is actually small).
  *
  * Float discipline: raw doubles end-to-end, quantized ONCE at the
  * output (round 2dp — doc log-likelihoods have magnitude ~10^3, the
  * q_nb large-magnitude-sum lesson; margins audited in COVERAGE.md).
  */
object BigramLm {

  /** In-doc adjacent pairs as (keep..., u, w) — scratch columns carry the
    * __graft_ prefix and only `keep` survives, so caller columns named
    * ts/p cannot collide or leak through. */
  private def pairsOf(docs: DataFrame, textCol: String, keep: Seq[String]) =
    docs.withColumn("__graft_blm_ts", graft.index.Bm25.tokensCol(col(textCol)))
      .filter(size(col("__graft_blm_ts")) >= 2)
      .select(keep.map(col) :+ explode(expr(
        "transform(sequence(0, size(__graft_blm_ts)-2), " +
          "i -> named_struct('u', __graft_blm_ts[i], 'w', __graft_blm_ts[i+1]))"))
        .as("__graft_blm_p"): _*)
      .select(keep.map(col) :+ col("__graft_blm_p.u").as("u") :+
        col("__graft_blm_p.w").as("w"): _*)

  /** Model tables: bigrams (u, w, cnt), unigrams (u, cnt) — pure counting,
    * one narrow pass each over the training corpus. */
  def train(docs: DataFrame, idCol: String, textCol: String): (DataFrame, DataFrame) = {
    val base = docs.filter(col(idCol).isNotNull)
    val bigrams = pairsOf(base, textCol, keep = Nil)
      .groupBy("u", "w").agg(count(lit(1)).as("cnt"))
    val unigrams = base
      .select(explode(graft.index.Bm25.tokensCol(col(textCol))).as("u"))
      .groupBy("u").agg(count(lit(1)).as("cnt"))
    (bigrams, unigrams)
  }

  /** Score `test` docs under the model: (doc, n_scored, score) where
    * n_scored counts the in-vocab-context pairs and score is the 2dp-
    * rounded conditional log-likelihood sum. */
  def score(test: DataFrame, idCol: String, textCol: String,
            bigrams: DataFrame, unigrams: DataFrame): DataFrame = {
    val vStats = unigrams.agg(count(lit(1)).cast("double").as("v"))
    val pairs = pairsOf(test.filter(col(idCol).isNotNull), textCol, keep = Seq(idCol))
      .select(col(idCol).as("doc"), col("u"), col("w"))
    pairs
      .join(unigrams.withColumnRenamed("cnt", "cnt_u"), "u")
      .join(bigrams.withColumnRenamed("cnt", "cnt_uw"), Seq("u", "w"), "left")
      .crossJoin(broadcast(vStats))
      .groupBy("doc")
      .agg(count(lit(1)).as("n_scored"),
        round(sum(
          log(coalesce(col("cnt_uw").cast("double"), lit(0.0)) + lit(1.0))
            - log(col("cnt_u").cast("double") + col("v"))), 2).as("score"))
  }
}
