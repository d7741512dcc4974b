package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval-context assembly — the offline half of the reference's RAG
  * answer flow (reference: src/utils/course_outline/question_rag.py — retrieve
  * top-k chunks, then stuff them into the model prompt until the context
  * window is full). The LLM call itself is egress and stays out of scope
  * (SURVEY.md §2.8 R5); everything before it — ranked retrieval, token
  * budgeting, prefix packing, prompt concatenation — is deterministic data
  * processing and lives here.
  */
object Context {

  /** Greedy prefix packing of the BM25 top-k under a token budget.
    *
    * tokens(doc) = max(1, len(text)/4) — the billing convention (reference
    * billing.py), identical to the per-doc ledger. Selection is
    * PREFIX-TRUNCATING: walk the ranking in order and stop at the first doc
    * that would overflow the budget. The running token sum is monotone, so
    * `cum_tokens <= budget` implements exactly that rule.
    *
    * Plan shape at 100 TB: corpus-wide scoring is Bm25.scores (one corpus
    * tokenize, broadcast query-term semi-join); top-k is orderBy+limit =
    * TakeOrderedAndProject (no global sort); the unpartitioned rank/cumsum
    * windows below run over the k retained rows only — bounded by
    * construction, never corpus-scale.
    *
    * @return (rank, doc, tokens, cum_tokens, score) for the selected docs.
    */
  def assemble(docs: DataFrame, idCol: String, textCol: String, query: String,
               k: Int, tokenBudget: Long): DataFrame = {
    val top = Bm25.scores(docs, idCol, textCol, query)
      .orderBy(desc("score"), asc("doc")).limit(k)
    val toks = top.join(
      docs.select(col(idCol).as("doc"),
        greatest(lit(1L), (length(col(textCol)) / 4).cast("long")).as("tokens")),
      "doc")
    // windows over <= k rows (post-limit): single tiny task by design
    val byRank = Window.orderBy(desc("score"), asc("doc"))
    toks
      .withColumn("rank", row_number().over(byRank).cast("long"))
      .withColumn("cum_tokens",
        sum("tokens").over(byRank.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cum_tokens") <= tokenBudget)
      .select(col("rank"), col("doc"), col("tokens"), col("cum_tokens"), col("score"))
  }

  /** The assembled prompt string itself: selected texts joined by `sep` in
    * rank order — one output row, built from the rank-bounded selection
    * (never corpus-scale). */
  def prompt(docs: DataFrame, idCol: String, textCol: String, query: String,
             k: Int, tokenBudget: Long, sep: String = "\n\n"): DataFrame = {
    assemble(docs, idCol, textCol, query, k, tokenBudget)
      .join(docs.select(col(idCol).as("doc"), col(textCol).as("t")), "doc")
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("rank"), col("t")))), x => x.getField("t")),
          sep).as("prompt"),
        count(lit(1)).as("n_docs"),
        coalesce(max("cum_tokens"), lit(0L)).as("tokens"))
  }
}
