package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval evaluation — recall@k and reciprocal rank per query, the
  * offline eval loop every retrieval stack ships (TREC run-vs-qrels
  * form): a ranked run is scored against a relevance set, per query,
  * so index/scoring changes are judged by a number instead of eyeballs.
  *
  * Exactness: every metric is integer counting plus ONE correctly-
  * rounded division quantized at the output (recall = hits/n_rel,
  * rr = 1/first_rank) — bit-identical cross-engine, no float-sum
  * contract. Queries with no relevant docs score 0 (never NULL, never
  * dropped); relevant docs the run missed entirely still count in the
  * recall denominator (n_rel comes from qrels, NOT from the join).
  *
  * Scale: one (qid, doc) equi-join (run size × small constant), one
  * qid-keyed aggregate each side, and a |queries|-sized final join —
  * eval cost is proportional to the RUN, never the corpus. Skew-free:
  * run rows per qid are bounded by the retrieval k.
  */
object Eval {

  /** Score `run` (qid, doc, rnk — 1-based, unique per qid) against
    * `qrels` (qid, doc). Emits per qid:
    * (qid, n_rel, hits_k, recall_k, first_rank, rr) with first_rank = 0
    * when no relevant doc was retrieved at any rank. */
  def metrics(run: DataFrame, qrels: DataFrame, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val rel = qrels.select(col("qid"), col("doc"), lit(true).as("rel"))
    val perQ = run.join(rel, Seq("qid", "doc"), "left")
      .groupBy("qid")
      .agg(
        sum(when(col("rel") && col("rnk") <= k, 1L).otherwise(0L)).as("hits_k"),
        min(when(col("rel"), col("rnk"))).as("first_rank0"))
    val nRel = qrels.groupBy("qid").agg(count(lit(1)).as("n_rel"))
    perQ.join(nRel, Seq("qid"), "full_outer")
      .select(col("qid"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        coalesce(col("hits_k"), lit(0L)).as("hits_k"),
        when(col("n_rel").isNull, lit(0.0))
          .otherwise(round(coalesce(col("hits_k"), lit(0L)).cast("double")
            / col("n_rel"), 6)).as("recall_k"),
        coalesce(col("first_rank0"), lit(0L)).as("first_rank"),
        when(col("first_rank0").isNull, lit(0.0))
          .otherwise(round(lit(1.0) / col("first_rank0"), 6)).as("rr"))
  }

  /** NDCG@k with graded relevance (Järvelin & Kekäläinen, TOIS'02 — the
    * exponential-gain form TREC uses): per qid,
    *
    *   DCG@k  = Σ_{rnk ≤ k} (2^grade − 1) / log2(rnk + 1)
    *   IDCG@k = the same sum over qrels sorted by grade DESC
    *   NDCG@k = DCG / IDCG   (0 when the query has no graded docs)
    *
    * `run` is (qid, doc, rnk — 1-based unique); `qrels` is
    * (qid, doc, grade ≥ 1 integer). Gains 2^g − 1 are exact small
    * integers; log2 is computed as ln(x)/ln(2) so the Spark and oracle
    * chains are the same IEEE ops (6-dp output quantum, one rounding).
    * Unjudged retrieved docs gain 0 (standard); judged docs the run
    * missed lower NDCG only through IDCG — both TREC conventions.
    *
    * Plan: the run side joins qrels per (qid, doc) — cost ∝ run; the
    * ideal side is a per-qid rank window over qrels (WindowGroupLimit-
    * able rnk ≤ k cut); final is a |queries|-sized join. */
  def ndcg(run: DataFrame, qrels: DataFrame, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    def log2(c: org.apache.spark.sql.Column) = log(c) / log(lit(2.0))
    val dcg = run.filter(col("rnk") <= k)
      .join(qrels, Seq("qid", "doc"), "left")
      .withColumn("dg",
        (pow(lit(2.0), coalesce(col("grade"), lit(0L)).cast("double")) - 1.0) /
          log2(col("rnk").cast("double") + 1.0))
      .groupBy("qid").agg(sum("dg").as("dcg"))
    val wIdeal = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(desc("grade"), asc("doc"))
    val idcg = qrels
      .withColumn("irnk", row_number().over(wIdeal))
      .filter(col("irnk") <= k)
      .withColumn("idg",
        (pow(lit(2.0), col("grade").cast("double")) - 1.0) /
          log2(col("irnk").cast("double") + 1.0))
      .groupBy("qid").agg(sum("idg").as("idcg"))
    dcg.join(idcg, Seq("qid"), "full_outer")
      .select(col("qid"),
        when(col("idcg").isNull || col("idcg") <= 0.0, lit(0.0))
          .otherwise(round(coalesce(col("dcg"), lit(0.0)) / col("idcg"), 6))
          .as("ndcg"))
  }

  /** Expected reciprocal rank @k (Chapelle et al., CIKM'09 — the cascade
    * metric: a user scans down and stops at a satisfying doc):
    *
    *   R_r   = (2^grade_r − 1) / 2^gmax        (stop probability at rank r)
    *   ERR@k = Σ_{r ≤ k} (R_r / r) · Π_{i<r} (1 − R_i)
    *
    * `run` is (qid, doc, rnk — 1-based unique); `qrels` is
    * (qid, doc, grade in [0, gmax]); unjudged retrieved docs take
    * R = 0 (they never satisfy, the cascade continues). The prefix
    * survival product is computed as exp(Σ ln(1−R)) over the ordered
    * window with the SAME op chain in the oracle — (1−R) ≥ 2^−gmax > 0
    * always. Output quantized once at 6 dp. Queries with no judged
    * positive doc in the run score 0.
    *
    * Plan: one (qid, doc) join, one rank-ordered window (bounded by k),
    * one aggregate — run-proportional like the other metrics. */
  def err(run: DataFrame, qrels: DataFrame, k: Int, gmax: Int = 3): DataFrame = {
    require(k > 0 && gmax >= 1, s"k=$k gmax=$gmax")
    val wPrev = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy("rnk")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val denom = math.pow(2.0, gmax)
    val scored = run.filter(col("rnk") <= k)
      .join(qrels, Seq("qid", "doc"), "left")
      .withColumn("r",
        (pow(lit(2.0), coalesce(col("grade"), lit(0L)).cast("double")) - 1.0) /
          lit(denom))
      .withColumn("survive",
        coalesce(exp(sum(log(lit(1.0) - col("r"))).over(wPrev)), lit(1.0)))
      .groupBy("qid")
      .agg(round(sum(col("r") / col("rnk").cast("double") * col("survive")), 6)
        .as("err"))
    run.select("qid").distinct()
      .join(scored, Seq("qid"), "left")
      .select(col("qid"), coalesce(col("err"), lit(0.0)).as("err"))
  }

  /** Average precision at cutoff k (trec_eval's `map_cut` convention —
    * the denominator is the query's TOTAL relevant count, so docs the
    * run never retrieved still penalize):
    *
    *   AP@k = Σ_{rnk ≤ k, doc relevant} (hits-up-to-rnk / rnk) / n_rel
    *
    * `run` is (qid, doc, rnk — 1-based unique); `qrels` is (qid, doc).
    * All inputs are integer counts; the sum of ≤ k exact rationals is
    * the only float, quantized once at 6 dp. Queries with no relevant
    * docs score 0 (never NULL).
    *
    * Plan: one (qid, doc) equi-join, one per-qid rank-ordered window
    * prefix count (bounded by the retrieval k), one aggregate. */
  def avgPrecision(run: DataFrame, qrels: DataFrame, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val rel = qrels.select(col("qid"), col("doc"), lit(true).as("rel"))
    val wRun = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy("rnk")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val ap = run.filter(col("rnk") <= k)
      .join(rel, Seq("qid", "doc"), "left")
      .withColumn("hit", when(col("rel"), 1L).otherwise(0L))
      .withColumn("hits_upto", sum("hit").over(wRun))
      .filter(col("hit") === 1L)
      .groupBy("qid")
      .agg(sum(col("hits_upto").cast("double") / col("rnk").cast("double")).as("apsum"))
    val nRel = qrels.groupBy("qid").agg(count(lit(1)).as("n_rel"))
    // every qid either side knows emits a row (a run query with no
    // relevant docs scores 0; a qrels query the run skipped scores 0)
    run.select("qid").union(qrels.select("qid")).distinct()
      .join(nRel, Seq("qid"), "left")
      .join(ap, Seq("qid"), "left")
      .select(col("qid"),
        when(col("n_rel").isNull || col("n_rel") === 0L, lit(0.0))
          .otherwise(round(coalesce(col("apsum"), lit(0.0)) / col("n_rel"), 6))
          .as("ap"))
  }
}
