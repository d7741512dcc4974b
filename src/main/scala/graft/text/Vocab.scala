package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vocabulary induction + unigram language-model scoring — the
  * tokenizer-prep / CCNet-style quality operators of a training-data
  * pipeline. Tokenization is the engine's shared lowercase-alphanumeric
  * tokenizer ([[graft.index.Bm25.tokensCol]]) so vocab, LM, BM25 and
  * MinHash all agree on what a token is.
  */
object Vocab {

  /** Top-V corpus vocabulary by frequency; ties break to the
    * lexicographically smaller term; rank is 1-based.
    *
    * Plan: one explode + one hash aggregate (map-side partials) over the
    * corpus; top-V is orderBy+limit = TakeOrderedAndProject (no global
    * sort); the rank window runs over the V retained rows only. */
  def top(docs: DataFrame, textCol: String, v: Int): DataFrame = {
    val byFreq = Window.orderBy(desc("cnt"), asc("term"))
    docs.select(explode(graft.index.Bm25.tokensCol(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("term")).limit(v)
      .withColumn("rank", row_number().over(byFreq).cast("long"))
  }

  /** Per-document negative log-likelihood under the corpus's own unigram
    * LM — the zero-egress analog of CCNet's wiki-LM perplexity filter
    * (high nll = out-of-distribution / junk; low = boilerplate-common).
    *
    *   p(term) = cnt(term) / total_tokens   (corpus MLE, no smoothing —
    *   every scored term occurs, so p > 0 by construction)
    *   nll(doc) = Σ_term tf·(−ln p(term)) / Σ_term tf, rounded 4dp.
    *
    * Plan: the (doc, term, tf) aggregate is computed once; corpus term
    * counts ride a `partition by term` window on it (one exchange, no
    * self-join) and the scalar total is a broadcast 1-row aggregate over
    * the same subtree (ReuseExchange — the corpus tokenizes once). */
  def lmScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = graft.index.Bm25.termFreq(docs.filter(col(idCol).isNotNull), idCol, textCol)
    val total = tf.agg(sum("tf").cast("double").as("total"))
    val byTerm = Window.partitionBy("term")
    tf.withColumn("cnt", sum("tf").over(byTerm))
      .crossJoin(broadcast(total))
      .groupBy("doc")
      .agg(
        sum("tf").cast("long").as("n_tokens"),
        round(sum(col("tf").cast("double") * -log(col("cnt").cast("double") / col("total"))) /
          sum(col("tf").cast("double")), 4).as("nll"))
  }

  /** Prefix query completion — the autocomplete surface over the corpus
    * vocabulary: for each prefix, the top-`k` terms by corpus frequency
    * (ties to the lexicographically smaller term), rank 1-based.
    *
    * All-integer ordering (freq, term) — no float contract. Plan: ONE
    * tokenize + term aggregate (map-side partials); prefixes enter as a
    * broadcast table joined by `startswith` (vocab × |prefixes| bounded —
    * a real deployment materializes the term aggregate once and serves
    * every prefix from it); the per-prefix `rn ≤ k` cut is the
    * WindowGroupLimit rewrite, truncating map-side before the shuffle. */
  def complete(docs: DataFrame, textCol: String, prefixes: Seq[String],
               k: Int): DataFrame = {
    require(prefixes.nonEmpty && k >= 1, s"prefixes=$prefixes k=$k")
    val spark = docs.sparkSession
    import spark.implicits._
    val byPrefix = Window.partitionBy("prefix").orderBy(desc("cnt"), asc("term"))
    docs.select(explode(graft.index.Bm25.tokensCol(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .join(broadcast(prefixes.toDF("prefix")),
        col("term").startsWith(col("prefix")))
      .withColumn("rank", row_number().over(byPrefix).cast("long"))
      .filter(col("rank") <= k)
      .select(col("prefix"), col("rank"), col("term"), col("cnt"))
  }
}
