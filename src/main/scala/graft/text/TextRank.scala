package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TextRank extractive summarization (Mihalcea & Tarau, EMNLP 2004 —
  * published algorithm): rank each document's sentences by PageRank over
  * the sentence-similarity graph and keep the top-k as the summary — the
  * summarization stage of a training-data pipeline (doc digests, dataset
  * cards), with the graph discipline this engine already proves.
  *
  * Integer-exact end to end: sentence similarity is the COUNT of shared
  * distinct tokens, expressed as MULTI-EDGES (one edge per shared term
  * per ordered pair) so [[graft.graph.PageRank]]'s multi-edge semantics
  * ARE the weighted graph — rank mass flows ∝ shared-token counts under
  * the same 64-bit unit arithmetic, and the oracle replays rounds
  * CTE-for-CTE with zero float contract (the q_pagerank discipline).
  *
  * Scale shape: sentences and tokens stay (doc, idx)-keyed — packed
  * `doc·4096 + idx` ids keep every PageRank shuffle on one long key;
  * the per-doc sentence cap (first [[MaxSents]] split slots) bounds both
  * the id packing and the worst-case pair fan-out; the top-k cut is a
  * `row_number ≤ k` window (WindowGroupLimit, map-side truncation).
  */
object TextRank {

  /** FROZEN sentence split: regex split on runs of .!? — empty segments
    * keep their slot so indices are reproducible on any engine. */
  val SentSplit = "[.!?]+"

  /** Per-doc sentence cap (first slots by position). 256 < 4096 keeps
    * the packed id injective. */
  val MaxSents = 256

  /** Top-`topK` summary sentences per doc: (doc, sent_idx, rank) with
    * rank in integer mass units; ties order by sentence position. */
  def summarize(docs: DataFrame, idCol: String, textCol: String,
                iters: Int = 6, topK: Int = 2): DataFrame = {
    require(topK >= 1, s"topK $topK")
    val sents = docs.filter(col(idCol).isNotNull)
      .select(col(idCol).cast("long").as("doc"),
        posexplode(split(col(textCol), SentSplit)).as(Seq("idx", "sent")))
      .filter(col("idx") < MaxSents)
    // single consumer (the edge aggregate) since the pair-explode rewrite
    // replaced the toks⋈toks self-join — no checkpoint needed: the
    // tokenize+distinct subtree runs exactly once, inside PageRank's edge
    // checkpoint job.
    val toks = sents
      .select(col("doc"), col("idx"),
        explode(graft.index.Bm25.tokensCol(col("sent"))).as("term"))
      .distinct()
    // node set derived NARROWLY from sents — (doc, idx) is unique there by
    // construction (posexplode of one split per doc), so "has ≥1 distinct
    // token" ≡ "tokensCol(sent) is non-empty": the same set the previous
    // toks.select(doc, idx).distinct() produced, with a size() filter per
    // row instead of a full shuffle of the token relation.
    val nodes = sents
      .filter(size(graft.index.Bm25.tokensCol(col("sent"))) > 0)
      .select((col("doc") * 4096 + col("idx")).as("id"))
    // shared-term multi-edges via ONE (doc, term) aggregate + ordered-pair
    // explode, replacing the toks⋈toks self-join (two sorted join legs →
    // one exchange): the idx list per (doc, term) is duplicate-free (toks
    // is distinct), so exploding all ordered pairs i ≠ j emits exactly the
    // self-join's row multiset. Per-(doc, term) fan-out is bounded by the
    // sentence cap (≤ MaxSents² pairs), the same bound the join had.
    val edges = toks.groupBy("doc", "term")
      .agg(collect_list(col("idx")).as("idxs"))
      .filter(size(col("idxs")) > 1)
      .select(col("doc"), explode(expr(
        "filter(flatten(transform(idxs, a -> transform(idxs, b -> struct(a, b)))), " +
          "p -> p.a != p.b)")).as("p"))
      .select((col("doc") * 4096 + col("p.a")).as("src"),
        (col("doc") * 4096 + col("p.b")).as("dst"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc").orderBy(desc("rank"), asc("sent_idx"))
    graft.graph.PageRank.run(edges, nodes, iters)
      .select(expr("id div 4096").as("doc"),
        (col("id") % 4096).as("sent_idx"), col("rank"))
      .withColumn("__graft_tr_rn", row_number().over(w))
      .filter(col("__graft_tr_rn") <= topK)
      .select(col("doc"), col("sent_idx"), col("rank"))
  }
}
