package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pseudo-relevance feedback (Rocchio, 1971; the PRF step of the
  * relevance-model family): assume the top-k BM25 results are relevant,
  * mine the terms that characterize them, append those to the query, and
  * re-score — the classic recall lever when the user's 3 words underspell
  * the topic.
  *
  * Determinism contract, by stage:
  *   - feedback set: top-k on the 4-dp ROUNDED scores, ties to the
  *     smaller doc ([[Bm25.scores]] — the Context/snippet discipline; raw
  *     doubles would make rank-k membership engine-dependent);
  *   - term mining: ALL-INTEGER rank `(tf_sum DESC, df_fb DESC, term)` —
  *     total occurrences across the feedback docs, then
  *     present-in-more-feedback-docs, then the term string; stopwords,
  *     short tokens and the original query terms are masked (the
  *     [[Keywords]] mask, PRF preference for terms COMMON across the
  *     feedback set);
  *   - re-scoring: BM25 over original ∪ mined terms (disjoint by
  *     construction, so no double-counted query term), ALL matching docs
  *     with rounded scores — no final top-k boundary to disagree on.
  *
  * Plan shape: the feedback side is bounded by k (semi-join on the top-k
  * ids; its vocabulary aggregate is k docs' distinct terms); the top-m cut
  * is TakeOrderedAndProject; the m mined terms cross the driver as a
  * bounded scalar list (the IVF-centroid pattern) to build the expanded
  * query; the corpus is then scored once by [[Bm25.scores]]'s
  * single-tokenize plan. */
object Prf {

  /** (rank, term, tf_sum, df_fb) — the top-m expansion terms mined from
    * the BM25 top-k feedback docs. Integer-exact ordering. */
  def expansionTerms(docs: DataFrame, idCol: String, textCol: String,
                     query: String, k: Int, m: Int, minLen: Int = 4,
                     stop: Seq[String] = Keywords.StopWords): DataFrame = {
    // standalone entry (q_prf_terms): mine from the k feedback docs'
    // TEXTS directly — a narrow tokenize of k docs, cheaper than deriving
    // their counts off a corpus-wide tf relation when no materialized tf
    // exists to share (search() below has one, and uses expansionFromTf)
    val qTerms = graft.dedup.MinHash.tokenize(query).distinct.toSeq
    val fb = Bm25.scores(docs, idCol, textCol, query)
      .orderBy(desc("score"), asc("doc")).limit(k)
    val fbDocs = docs.join(fb.select(col("doc")),
      col(idCol).cast("string") === col("doc").cast("string"))
    val toks = fbDocs.select(col("doc"),
        explode(Bm25.tokensCol(col(textCol))).as("term"))
      .filter(length(col("term")) >= minLen &&
        !col("term").isin(stop: _*) && !col("term").isin(qTerms: _*))
    val tf = toks.groupBy("doc", "term").agg(count(lit(1)).as("tf"))
    rankTerms(tf, m)
  }

  /** [[expansionTerms]] from a PRE-MATERIALIZED corpus (doc, term, tf)
    * relation (search()'s checkpointed tf): the feedback docs' counts are
    * read off it (semi-join on the top-k ids + the term masks) instead of
    * re-tokenizing their texts — definitionally the same aggregate. */
  private def expansionFromTf(tfAll: DataFrame, query: String, k: Int, m: Int,
                              minLen: Int, stop: Seq[String]): DataFrame = {
    val qTerms = graft.dedup.MinHash.tokenize(query).distinct.toSeq
    val fb = Bm25.scoredAllFromTf(tfAll, query)
      .select(col("doc"), round(col("score"), 4).as("score"))
      .orderBy(desc("score"), asc("doc")).limit(k)
    val fbIds = fb.select(col("doc").cast("string").as("__graft_fb_doc"))
    val tf = tfAll
      .join(fbIds, tfAll("doc").cast("string") === col("__graft_fb_doc"), "left_semi")
      .filter(length(col("term")) >= minLen &&
        !col("term").isin(stop: _*) && !col("term").isin(qTerms: _*))
    rankTerms(tf, m)
  }

  /** The integer-exact (tf_sum DESC, df_fb DESC, term) rank over a masked
    * feedback (doc, term, tf) relation — shared by both mining entries. */
  private def rankTerms(tf: DataFrame, m: Int): DataFrame =
    tf.groupBy("term")
      .agg(sum("tf").as("tf_sum"), count(lit(1)).as("df_fb"))
      .orderBy(desc("tf_sum"), desc("df_fb"), asc("term"))
      .limit(m)
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(desc("tf_sum"), desc("df_fb"), asc("term"))))
      .select("rank", "term", "tf_sum", "df_fb")

  /** (doc, score): the corpus re-scored with the expanded query — every
    * matching doc, 4-dp rounded (no top-k boundary).
    *
    * The corpus is tokenized ONCE: the (doc, term, tf) relation is
    * materialized (localCheckpoint) and feeds the feedback pass, the term
    * mining AND the expanded re-score — previously each of the two scoring
    * actions re-ran the corpus tokenize+aggregate (separate actions share
    * no AQE stage cache), the dominant cost of the two-pass algorithm. */
  def search(docs: DataFrame, idCol: String, textCol: String,
             query: String, k: Int, m: Int): DataFrame = {
    val tfAll = Bm25.termFreq(docs.filter(col(idCol).isNotNull), idCol, textCol)
      .localCheckpoint()
    val mined = expansionFromTf(tfAll, query, k, m, 4, Keywords.StopWords)
      .orderBy("rank").select("term")
      .collect().map(_.getString(0)) // bounded: m rows
    val expanded = (graft.dedup.MinHash.tokenize(query).distinct ++ mined)
      .mkString(" ")
    Bm25.scoredAllFromTf(tfAll, expanded)
      .select(col("doc"), round(col("score"), 4).as("score"))
  }
}
