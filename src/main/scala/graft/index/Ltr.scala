package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Learning-to-rank feature assembly — the (query, doc) feature matrix a
  * ranking model trains on (the LETOR/MSLR feature-file shape): one row
  * per candidate document carrying every scoring family this engine
  * implements plus the structural statistics rankers lean on.
  *
  *   f_bm25     BM25 (k1=1.2, b=0.75), 4 dp
  *   f_tfidf    TF-IDF Σ tf·ln((N+1)/(df+1)), 4 dp
  *   f_ql       Dirichlet query likelihood (μ=2000), 4 dp
  *   f_prox     width-`w` proximity co-occurrence windows (integer)
  *   f_dl       document token length (integer)
  *   f_matched  distinct query terms present (integer)
  *
  * Candidates are docs containing ≥ 1 query term (every scorer's shared
  * DAAT set); f_prox left-joins (a candidate whose terms never cluster
  * gets 0). Each component keeps its own oracle-proven arithmetic and
  * rounding, so the matrix introduces NO new float surface — it is pure
  * composition, and the driver gate cross-checks all three scorers and
  * the proximity engine against one joined DuckDB replay.
  *
  * Plan: the component scorers all tokenize through [[Bm25.termFreq]]'s
  * canonical subtree, so AQE's stage cache materializes the corpus scan
  * once and the assembly is equi-joins on `doc` — co-partitioned after
  * the first shuffle. f_dl is a narrow per-row map (no aggregation).
  */
object Ltr {

  def features(docs: DataFrame, idCol: String, textCol: String,
               query: String, w: Int = 6): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val live = docs.filter(col(idCol).isNotNull)
    val qTerms = graft.dedup.MinHash.tokenize(query).distinct.toSeq.toDF("term")
    val bm25 = Bm25.scores(live, idCol, textCol, query)
      .withColumnRenamed("score", "f_bm25")
    val tfidf = Bm25.tfidfScores(live, idCol, textCol, query)
      .withColumnRenamed("score", "f_tfidf")
    val ql = QueryLikelihood.scores(live, idCol, textCol, query)
      .withColumnRenamed("score", "f_ql")
    val prox = Bm25.proximityWindows(live, idCol, textCol, query, w)
      .withColumnRenamed("n_windows", "f_prox")
    // dl from tf (dl == Σ_term tf — the scoredAll discipline): rides the
    // one materialized tokenize exchange instead of a second corpus
    // scan+tokenize; every candidate has ≥ 1 token so coverage is equal.
    val tf = Bm25.termFreq(live, idCol, textCol)
    val dl = tf.groupBy("doc").agg(sum("tf").as("f_dl"))
    val matched = tf
      .join(broadcast(qTerms), "term")
      .groupBy("doc").agg(count(lit(1)).as("f_matched"))
    bm25
      .join(tfidf, "doc")
      .join(ql, "doc")
      .join(prox.withColumnRenamed("f_prox", "f_prox0"), Seq("doc"), "left")
      .join(dl, "doc")
      .join(matched, "doc")
      .select(col("doc"), col("f_bm25"), col("f_tfidf"), col("f_ql"),
        coalesce(col("f_prox0"), lit(0L)).as("f_prox"),
        col("f_dl"), col("f_matched"))
  }
}
