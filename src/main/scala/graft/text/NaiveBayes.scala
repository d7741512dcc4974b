package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes text classifier with add-one smoothing — the
  * trainable counterpart of the heuristic language-id / doc-type rules
  * (SURVEY §2.3 C4/C5): the published linear classifier the corpus-
  * curation pipelines train for language and quality gating (CCNet's
  * fastText stage; RefinedWeb's quality classifier) — here from scratch
  * as two aggregations and a broadcast-join scorer, no ML runtime.
  *
  * Training is pure counting (one tokenize + one (label, term) aggregate);
  * the model is a (term × class) grid of log-likelihoods
  * `ln((cnt_tc + 1) / (tokens_c + V))` plus per-class log-priors
  * `ln((docs_c + 1) / (N + C))`. Scoring inner-joins test term
  * frequencies against the BROADCAST grid (vocab is bounded — compose
  * with top-V vocabulary induction (q_vocab) at open-web scale), so the
  * corpus never shuffles: one narrow join + one (doc, class) aggregate.
  * Terms outside the training vocabulary are ignored (the standard
  * multinomial convention); a test doc with no in-vocab terms emits no
  * rows.
  *
  * Float discipline: raw doubles end-to-end, quantized ONCE at the
  * output (round 2dp — log-sums have magnitude ~10^3, so 2dp keeps the
  * boundary margin orders above both summation-order drift and
  * cross-engine libm ulps; audited in COVERAGE.md).
  */
object NaiveBayes {

  /** Model tables: grid (term, class, ln_theta) over the FULL training
    * vocab × class cross product, priors (class, ln_prior). */
  def train(docs: DataFrame, idCol: String, textCol: String, labelCol: String):
      (DataFrame, DataFrame) = {
    // The (doc, class, term) count relation materializes ONCE
    // (localCheckpoint, the Bm25F field-length precedent): its five
    // consumers (class-term counts, class totals, docs-per-class, N/C,
    // vocab) prune columns differently, so without a materialized leaf
    // Catalyst forks the training tokenize into four separate corpus
    // scans (plan-audited). Training is the one eager step of model
    // fitting; scoring stays fully lazy.
    val tf = docs.filter(col(idCol).isNotNull)
      .select(col(idCol).as("doc"), col(labelCol).as("class"),
        explode(graft.index.Bm25.tokensCol(col(textCol))).as("term"))
      .groupBy("doc", "class", "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val classTerm = tf.groupBy("class", "term").agg(sum("tf").as("cnt"))
    val classTotals = classTerm.groupBy("class").agg(sum("cnt").as("tokens_c"))
    val docsPerClass = tf.select("doc", "class").distinct()
      .groupBy("class").agg(count(lit(1)).as("docs_c"))
    val nStats = docsPerClass.agg(sum("docs_c").cast("double").as("n"),
      count(lit(1)).cast("double").as("c"))
    val vocab = classTerm.select("term").distinct()
    val vStats = vocab.agg(count(lit(1)).cast("double").as("v"))
    val grid = vocab.crossJoin(classTotals)
      .join(classTerm, Seq("term", "class"), "left")
      .crossJoin(broadcast(vStats))
      .select(col("term"), col("class"),
        (log(coalesce(col("cnt").cast("double"), lit(0.0)) + lit(1.0))
          - log(col("tokens_c").cast("double") + col("v"))).as("ln_theta"))
    val priors = docsPerClass.crossJoin(broadcast(nStats))
      .select(col("class"),
        (log(col("docs_c").cast("double") + lit(1.0))
          - log(col("n") + col("c"))).as("ln_prior"))
    (grid, priors)
  }

  /** Per-(doc, class) log-posterior scores of `test` under the model:
    * ln_prior + Σ_t tf · ln_theta over the doc's in-vocab terms.
    * Returns (doc, class, score) with score rounded to 2dp. */
  def score(test: DataFrame, idCol: String, textCol: String,
            grid: DataFrame, priors: DataFrame): DataFrame = {
    val tf = test.filter(col(idCol).isNotNull)
      .select(col(idCol).as("doc"), explode(graft.index.Bm25.tokensCol(col(textCol))).as("term"))
      .groupBy("doc", "term").agg(count(lit(1)).as("tf"))
    // NO broadcast hint on the grid: it is vocab × classes — bounded only
    // when the caller bounds the vocabulary (top-V induction), and a
    // forced broadcast of an open-web vocabulary is an unbounded
    // driver/executor allocation (guide §5). The planner still broadcasts
    // automatically whenever the grid is under the threshold (every gate
    // corpus), and AQE picks the join side at runtime otherwise.
    tf.join(grid, "term")
      .groupBy("doc", "class")
      .agg(sum(col("tf").cast("double") * col("ln_theta")).as("ll"))
      .join(broadcast(priors), "class")
      .select(col("doc"), col("class"),
        round(col("ll") + col("ln_prior"), 2).as("score"))
  }
}
