package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Query-likelihood retrieval with Dirichlet smoothing (Ponte & Croft,
  * SIGIR'98; smoothing per Zhai & Lafferty, SIGIR'01) — the third classic
  * scoring family beside BM25 and TF-IDF:
  *
  *   score(d) = Σ_{t∈q} ln( (tf_td + μ·P(t|C)) / (dl_d + μ) ),
  *   P(t|C) = cf_t / |C|,  μ = 2000 (the published default).
  *
  * Implemented in the rank-equivalent DAAT decomposition (the form real
  * engines traverse postings with — absent terms never materialize):
  *
  *   score(d) = Σ_{t∈q∩d} ln(1 + tf_td / (μ·P(t|C)))
  *            + Σ_{t∈q} ln(μ·P(t|C))  −  |q|·ln(dl_d + μ)
  *
  * The first sum runs over MATCHING (doc, term) rows only; the second is
  * a query-global scalar; the third is per-doc. Query terms absent from
  * the whole corpus (cf = 0) drop from both query-side sums — the
  * standard OOV handling (they would otherwise −∞ every candidate
  * equally). Candidates are docs containing ≥ 1 query term (the DAAT
  * candidate set).
  *
  * Plan: ONE corpus tokenize (the [[Bm25.scoredAll]] discipline — dl
  * derives from tf so the (doc, term) exchange is shared), query terms
  * broadcast, cf via a window over the pruned matching rows, the two
  * smoothing scalars as broadcast 1-row relations. Oracle-comparable
  * form: all candidates, no top-k, quantized once at 4 dp.
  */
object QueryLikelihood {

  val Mu = 2000.0

  def scores(docs: DataFrame, idCol: String, textCol: String, query: String,
             mu: Double = Mu): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(mu > 0, s"mu $mu")
    val tf = Bm25.termFreq(docs.filter(col(idCol).isNotNull), idCol, textCol)
    val dl = tf.groupBy("doc").agg(sum("tf").as("dl"))
    val stats = dl.agg(sum(col("dl")).cast("double").as("ctot"))
    val qTerms = graft.dedup.MinHash.tokenize(query).distinct.toSeq.toDF("term")
    val qtf = tf.join(broadcast(qTerms), "term")
    val wTerm = org.apache.spark.sql.expressions.Window.partitionBy("term")
    // one windowed matching relation feeds BOTH the per-doc scoring leg
    // and the query-global scalars (K = Σ_t ln(μ·p_t), nq = |{t: cf>0}|):
    // cfk is a distinct over (term, cf) of the SAME subtree, so the
    // tokenize + term exchange canonicalizes equal and is materialized
    // once instead of re-scanning the corpus for a separate aggregate.
    val qtfWin = qtf.withColumn("cf", sum(col("tf")).over(wTerm).cast("double"))
    val kRow = qtfWin.select("term", "cf").distinct()
      .crossJoin(stats)
      .agg(sum(log(lit(mu) * col("cf") / col("ctot"))).as("kconst"),
        count(lit(1)).cast("double").as("nq"))
    qtfWin
      .crossJoin(broadcast(stats))
      .withColumn("w", log(lit(1.0) +
        col("tf").cast("double") / (lit(mu) * col("cf") / col("ctot"))))
      .groupBy("doc").agg(sum("w").as("wsum"))
      .join(dl, "doc")
      .crossJoin(broadcast(kRow))
      .select(col("doc"),
        round(col("wsum") + col("kconst") -
          col("nq") * log(col("dl").cast("double") + lit(mu)), 4).as("score"))
  }

  /** Top-k by (rounded score DESC, doc) — TakeOrderedAndProject, no
    * global sort. */
  def search(docs: DataFrame, idCol: String, textCol: String, query: String,
             k: Int, mu: Double = Mu): DataFrame =
    scores(docs, idCol, textCol, query, mu)
      .orderBy(desc("score"), asc("doc"))
      .limit(k)
}
