package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein, SIGIR'98 —
  * published formula): greedily select k results maximizing
  * `λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s)` — relevance traded against
  * redundancy with the already-selected set. This is the diversification
  * pass the reference's RAG flow would run between Chroma top-k and prompt
  * assembly (SURVEY.md §2.8 R2; reference question_rag.py:130-194).
  *
  * Scale shape (100 TB): MMR is inherently sequential in k, so the
  * production decomposition is distributed top-m retrieval first
  * (TakeOrderedAndProject / ANN — m bounded by design, e.g. 20–1000),
  * then the greedy loop over the m survivors on the driver. `rerank`
  * enforces the bound with `maxCandidates` — it never collects an
  * unbounded relation (the limit is applied INSIDE, so a caller cannot
  * accidentally hand it the full corpus).
  *
  * Determinism contract: all arithmetic is double (vectors cast once),
  * cosine is the same sequential dot/norm form as [[Knn.cosineCol]] with
  * the identical 1e-12 guard, ties break by id asc, and the oracle SQL is
  * generated from the SAME λ / (1−λ) doubles (toString round-trips
  * exactly — note 1−0.7 is 0.30000000000000004, not 0.3).
  */
object Mmr {

  /** Sequential-fold cosine, mirroring Knn.cosineCol / the DuckDB
    * list_dot_product replica exactly. */
  private[graft] def cosine(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / math.max(math.sqrt(na) * math.sqrt(nb), 1e-12)
  }

  /** Greedy MMR over a bounded candidate relation.
    *
    * @param cands (id, rel, vec) — rel = relevance (higher better), vec the
    *              embedding as array&lt;double&gt;. Only the top
    *              `maxCandidates` by (rel desc, id asc) are considered.
    * @return (rnk 1..k, id) in selection order.
    */
  def rerank(spark: SparkSession, cands: DataFrame, idCol: String, relCol: String,
             vecCol: String, k: Int, lambda: Double, maxCandidates: Int = 4096): DataFrame = {
    import spark.implicits._
    val mu = 1.0 - lambda
    val rows = cands
      .select(col(idCol).cast("long").as("id"), col(relCol).cast("double").as("rel"),
        col(vecCol).cast("array<double>").as("vec"))
      .orderBy(col("rel").desc, col("id").asc)
      .limit(maxCandidates)
      .as[(Long, Double, Array[Double])]
      .collect()

    val selected = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    val selVecs = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    val used = scala.collection.mutable.HashSet.empty[Long]
    var rnk = 1
    while (rnk <= k && used.size < rows.length) {
      // round 1 is pure relevance; later rounds subtract the max cosine to
      // any already-selected vector
      var best: (Long, Double, Array[Double]) = null
      var bestScore = Double.NegativeInfinity
      for (c <- rows if !used.contains(c._1)) {
        val score =
          if (selVecs.isEmpty) c._2
          else {
            var maxSim = Double.NegativeInfinity
            for (s <- selVecs) { val sim = cosine(c._3, s); if (sim > maxSim) maxSim = sim }
            lambda * c._2 - mu * maxSim
          }
        if (score > bestScore || (score == bestScore && best != null && c._1 < best._1)) {
          best = c; bestScore = score
        }
      }
      used += best._1; selVecs += best._3; selected += ((rnk, best._1)); rnk += 1
    }
    selected.toSeq.toDF("rnk", "id")
  }
}
