package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25F — fielded BM25 (Robertson, Zaragoza & Taylor, CIKM 2004, "Simple
  * BM25 extension to multiple weighted fields"): the web-search scoring
  * function proper, where a document is not one bag of words but several
  * (body, title, incoming ANCHOR TEXT — the Brin & Page §2.2 signal the
  * [[graft.graph.AnchorText]] operator aggregates), each with its own
  * weight and length normalization. Field frequencies are normalized and
  * weighted FIRST and summed into one pseudo-frequency, then saturated
  * once — the published insight that separates BM25F from naively adding
  * per-field BM25 scores (which over-saturates terms appearing in many
  * fields).
  *
  *   tf̃(t,d)  = Σ_f  w_f · tf_f(t,d) / (1 − b_f + b_f · len_f(d)/avglen_f)
  *   score(d) = Σ_{t ∈ q} idf(t) · tf̃ / (k1 + tf̃)
  *
  * with idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)), df counted on
  * whole-document presence (any field), N = distinct docs in the relation.
  *
  * Float contract: identical to [[Bm25]] — per-term contributions are
  * bounded sums (≤ |fields| per tf̃, ≤ |query| per doc), quantized ONCE at
  * the 4-dp output; avglen_f is the same corpus-avg class q_bm25 already
  * gates green.
  *
  * Plan shape: the broadcast query-term semi-join prunes the (doc, field,
  * term) relation BEFORE every other join; field params and per-field
  * averages are tiny broadcasts; df rides a window over the (doc, term)
  * aggregate (no extra subtree); the field-length relation is
  * materialized once (see the flen comment). Net: exactly TWO corpus
  * tokenizes per call — the flen checkpoint job and the scoring job —
  * independent of the number of stats consumers. */
object Bm25F {

  /** (doc, score) for every doc matching ≥ 1 query term. `docs` is the
    * LONG format (docCol, fieldCol, textCol) — one row per document field;
    * rows whose field is not in `fieldParams` (weight w_f, length-norm
    * b_f) are ignored. */
  def scores(docs: DataFrame, docCol: String, fieldCol: String, textCol: String,
             query: String, fieldParams: Map[String, (Double, Double)],
             k1: Double = Bm25.K1): DataFrame = {
    require(fieldParams.nonEmpty, "fieldParams must name at least one field")
    val spark = docs.sparkSession
    import spark.implicits._
    val qTerms = graft.dedup.MinHash.tokenize(query).distinct.toSeq.toDF("term")
    val params = fieldParams.toSeq.map { case (f, (w, b)) => (f, w, b) }
      .toDF("field", "w", "b")
    // explicit isnotnull on all three columns (semantic no-ops): the qtf
    // branch's joins push these filters into ITS copy of the subtree, and
    // without the same filters on the flen branch the two canonicalize
    // differently and AQE's stage cache cannot reuse the tokenize exchange
    // — the Bm25.scoredAll lesson
    val toks = docs
      .filter(col(fieldCol).isin(fieldParams.keys.toSeq: _*))
      .filter(col(docCol).isNotNull && col(fieldCol).isNotNull)
      .select(col(docCol).cast("string").as("doc"),
        col(fieldCol).cast("string").as("field"),
        explode(Bm25.tokensCol(col(textCol))).as("term"))
      .filter(col("term").isNotNull)
    val tf = toks.groupBy("doc", "field", "term").agg(count(lit(1)).as("tf"))
    // field lengths derive from tf (flen == Σ_term tf, definitionally) and
    // are MATERIALIZED once (localCheckpoint): three consumers (avglen,
    // N, the per-term normalization join) each prune this subtree
    // differently, so AQE's stage cache sees three canonical variants and
    // would re-run the corpus tokenize per consumer. The materialized
    // relation is doclen-class — one row per (doc, field), the same table
    // IndexJob commits to disk — so its blocks are corpus-doc-count-sized,
    // spill-safe, not token-stream-sized. Net: TWO corpus tokenizes per
    // call (the checkpoint job + the scoring job), independent of how many
    // stats consumers exist.
    val flen = tf.groupBy("doc", "field")
      .agg(sum("tf").cast("double").as("flen"))
      .localCheckpoint()
    val avglen = flen.groupBy("field").agg(avg("flen").as("avgflen"))
    val stats = flen.select("doc").distinct()
      .agg(count(lit(1)).cast("double").as("n"))
    val qtf = tf.join(broadcast(qTerms), "term")
    val tfn = qtf
      .join(flen, Seq("doc", "field"))
      .join(broadcast(avglen), "field")
      .join(broadcast(params), "field")
      .withColumn("tfn", col("w") * col("tf").cast("double") /
        (lit(1.0) - col("b") + col("b") * col("flen") / col("avgflen")))
      .groupBy("doc", "term").agg(sum("tfn").as("tfn"))
    // df via a window over tfn — (doc, term) rows are unique post-
    // aggregate, so count(*) over term == whole-doc document frequency;
    // a separate distinct+aggregate subtree would re-derive qtf (the
    // scoredAll df trick applied one level up)
    val wTerm = org.apache.spark.sql.expressions.Window.partitionBy("term")
    tfn.withColumn("df", count(lit(1)).over(wTerm).cast("double"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("sc", col("idf") * col("tfn") / (lit(k1) + col("tfn")))
      .groupBy("doc").agg(sum("sc").as("score"))
      .select(col("doc"), round(col("score"), 4).as("score"))
  }
}
