package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-document keyword extraction: the top-k content terms of each doc,
  * ranked frequency-first with a rarity tiebreak — `tf DESC, df ASC,
  * term ASC` after a stopword/length mask. The rank key is deliberately
  * ALL-INTEGER (tf and df are counts): no float score exists anywhere, so
  * the extracted keywords are bit-identical across engines and
  * partitionings — the graded-float family (TF-IDF/BM25 with real idf
  * weighting) lives in [[Bm25]]; this is its exact-ordering sibling for
  * tagging/faceting at corpus scale.
  *
  * Plan shape: tf is one (doc, term) hash aggregate; df is a second
  * aggregate OVER the tf relation (already one row per doc-term, so
  * `count` == document frequency — no distinct needed); the join back is
  * term-co-partitioned with the df aggregate; the final per-doc top-k is
  * `row_number ≤ k` directly above its Window — the WindowGroupLimit
  * shape, so each doc ships at most k candidate rows per partition out of
  * the rank exchange. Every stage runs over the bounded distinct
  * doc-term relation, never the raw token stream.
  */
object Keywords {

  /** Frozen minimal stopword mask (function words only — the mechanism,
    * not the lexicon, is the operator; callers pass their own for real
    * corpora). Frozen for oracle parity. */
  val StopWords: Seq[String] = Seq(
    "the", "and", "for", "that", "with", "this", "from", "are", "was",
    "have", "has", "not", "you", "but", "all", "can", "will", "would",
    "there", "been", "more", "also", "into", "than", "its", "about",
    "over", "such", "only", "other", "some", "these", "them", "then",
    "when", "which", "what", "their", "they", "were", "your")

  /** (doc, rank, term, tf, df) — the top-k keywords of every document. */
  def topK(docs: DataFrame, idCol: String, textCol: String,
           k: Int = 5, minLen: Int = 4,
           stop: Seq[String] = StopWords): DataFrame = {
    val toks = docs.select(col(idCol).cast("string").as("doc"),
        explode(Bm25.tokensCol(col(textCol))).as("term"))
      .filter(length(col("term")) >= minLen && !col("term").isin(stop: _*))
    val tf = toks.groupBy("doc", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val byDoc = Window.partitionBy("doc")
      .orderBy(col("tf").desc, col("df").asc, col("term"))
    tf.join(dfreq, "term")
      .withColumn("rank", row_number().over(byDoc))
      .filter(col("rank") <= k)
      .select("doc", "rank", "term", "tf", "df")
  }
}
