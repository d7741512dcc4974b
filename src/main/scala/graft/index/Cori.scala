package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CORI resource selection / selective search (Callan, Lu & Croft,
  * SIGIR'95 "Searching distributed collections with inference networks";
  * Kulkarni & Callan, CIKM'10 on selective search): rank topical SHARDS
  * of a corpus by per-shard collection statistics alone, then run the
  * real retrieval only inside the top-m shards.
  *
  * This is THE query-cost bound for a 100-TB corpus: the per-shard stats
  * table is (shards × query terms) rows — kilobytes — so shard ranking
  * touches no documents at all, and the document-level query then fans
  * out to m shards instead of all of them (sublinear query cost in
  * corpus size once the corpus is shard-partitioned: the `isin` filter
  * on the shard column partition-prunes the scan).
  *
  * Belief formula (the df.icf T·I form, CORI's published constants):
  *   T = df / (df + 50 + 150 · cw_s / avg_cw)
  *   I = ln((S + 0.5) / cf_t) / ln(S + 1.0)
  *   p(t|s) = 0.4 + 0.6 · T · I           (df = 0 ⇒ the 0.4 default belief)
  *   score(s) = Σ_t p(t|s) / |q|
  * where df = docs of shard s containing t, cw_s = token count of shard
  * s, S = number of shards, cf_t = number of shards containing t.
  *
  * All statistics are integers; the only floats are the final T·I
  * arithmetic, so cross-engine drift stays at ulp scale and the output
  * quantizes ONCE at 6 dp (margin audited: min half-boundary distance
  * ≥ 1.9e-9 at both SFs vs ~4e-15 drift — 6 orders).
  */
object Cori {

  /** Per-shard CORI belief for `query`: (shard, cw, score), one row per
    * shard with ≥ 1 token (S counts exactly those).
    *
    * Plan: ONE corpus scan / ONE tokenize. Tokens aggregate to
    * (shard, doc, query-term-or-null) with map-side partial combine
    * (cardinality ≈ docs × (|q|+1), each row carrying its occurrence
    * count), then to (shard, query-term-or-null) — |shards| × (|q|+1)
    * rows, which is `localCheckpoint`ed (model-fit-sized — the NB-training
    * pattern) so the cw / df / cf / stats consumers read one materialized
    * leaf instead of forking the corpus scan per branch. Everything
    * downstream is broadcast-sized. In production these stats ride the
    * index build once per segment — queries read only the committed
    * stats table. */
  def rankShards(docs: DataFrame, idCol: String, textCol: String,
                 shardCol: String, query: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val qSeq = graft.dedup.MinHash.tokenize(query).distinct.toSeq
    require(qSeq.nonEmpty, "empty query")
    val qTerms = qSeq.toDF("term")
    // (shard, qterm|null, df = docs containing, toksum = occurrences):
    // the null row per shard carries the non-query token mass so cw is
    // recoverable; df for query terms is exact-distinct by construction
    // (one (shard, doc, qterm) row per containing doc).
    val perShard = docs
      .select(col(shardCol).as("shard"), col(idCol).as("doc"),
        explode(Bm25.tokensCol(col(textCol))).as("term"))
      .groupBy(col("shard"), col("doc"),
        when(col("term").isin(qSeq.map(x => x: Any): _*), col("term"))
          .as("qterm"))
      .agg(count(lit(1)).as("c"))
      .groupBy("shard", "qterm")
      .agg(count(lit(1)).as("df"), sum("c").as("toksum"))
      .localCheckpoint()
    val cw = perShard.groupBy("shard").agg(sum("toksum").as("cw"))
    val stats = cw.agg(count(lit(1)).cast("double").as("s"),
      avg(col("cw").cast("double")).as("avgcw"))
    val df = perShard.filter(col("qterm").isNotNull)
      .select(col("shard"), col("qterm").as("term"), col("df"))
    val cf = df.groupBy("term").agg(count(lit(1)).cast("double").as("cf"))
    val t = col("dfv") / (col("dfv") + lit(50.0) +
      lit(150.0) * col("cw").cast("double") / col("avgcw"))
    val i = log((col("s") + lit(0.5)) / greatest(col("cfv"), lit(1.0))) /
      log(col("s") + lit(1.0))
    cw.crossJoin(broadcast(qTerms))
      .join(df, Seq("shard", "term"), "left")
      .join(broadcast(cf), Seq("term"), "left")
      .crossJoin(broadcast(stats))
      .withColumn("dfv", coalesce(col("df").cast("double"), lit(0.0)))
      .withColumn("cfv", coalesce(col("cf"), lit(1.0)))
      .withColumn("p", lit(0.4) + lit(0.6) * t * i)
      .groupBy("shard")
      .agg(first("cw").as("cw"),
        round(sum("p") / qSeq.size.toDouble, 6).as("score"))
  }

  /** Selective search: BM25 top-k over ONLY the top-m CORI shards.
    * Selection orders by the ROUNDED shard score (house discipline — an
    * unrounded orderBy could flip boundary membership cross-engine), ties
    * to the smaller shard key. The m selected keys are a bounded driver
    * collect (m values — the probed-cell pattern); the subset filter is a
    * literal `isin`, partition-prunable when the corpus is written
    * shard-partitioned. BM25 statistics are computed WITHIN the selected
    * subset — each shard group is its own collection, the selective-search
    * contract (scores are not comparable to a full-corpus run by design;
    * CORI's merge weighting is the documented next step). */
  def search(docs: DataFrame, idCol: String, textCol: String,
             shardCol: String, query: String, m: Int, k: Int): DataFrame = {
    require(m >= 1 && k >= 1, s"m=$m k=$k")
    val sel = rankShards(docs, idCol, textCol, shardCol, query)
      .orderBy(desc("score"), asc("shard"))
      .limit(m)
      .select("shard").collect().map(_.get(0)).toSeq
    val subset = docs.filter(col(shardCol).isin(sel: _*))
    Bm25.scores(subset, idCol, textCol, query)
      .orderBy(desc("score"), asc("doc"))
      .limit(k)
  }

  /** Federated selective search with CORI result merging (Callan's
    * distributed-IR survey, Kluwer 2000, §4: the heuristic that made
    * per-collection scores comparable): each selected shard is scored as
    * ITS OWN collection — its own N/avgdl/df, exactly how a federated
    * system's per-shard indexes behave — and each doc score D from shard
    * s is normalized by the shard's belief R_s against the mean belief
    * R̄ of the selected shards:
    *
    *   D' = D · (1 + 0.4 · (R_s − R̄) / R̄)
    *
    * so docs from better-matching shards outrank equal raw scores from
    * weaker ones. The per-shard runs are m independent plan branches
    * unioned (m is small by contract — that is the point of selective
    * search); each branch's `isin` filter partition-prunes. Beliefs
    * enter at their 6-dp quantization (both engines agree exactly);
    * the merged score quantizes once at 4 dp. Returns top-k
    * (doc, shard, score). */
  def mergedSearch(docs: DataFrame, idCol: String, textCol: String,
                   shardCol: String, query: String, m: Int, k: Int): DataFrame = {
    require(m >= 1 && k >= 1, s"m=$m k=$k")
    val sel = rankShards(docs, idCol, textCol, shardCol, query)
      .orderBy(desc("score"), asc("shard"))
      .limit(m)
      .select("shard", "score").collect()
      .map(r => (r.get(0), r.getDouble(1))).toSeq
    // token-empty corpus -> no shards: degrade to an empty typed result
    // like `search` does (reduce on zero branches would throw; rbar = NaN)
    if (sel.isEmpty)
      return docs.filter(lit(false))
        .select(col(idCol).as("doc"), col(shardCol).as("shard"),
          lit(0.0).as("score"))
    val rbar = sel.map(_._2).sum / sel.size
    val perShard = sel.map { case (shard, r) =>
      val weight = 1.0 + 0.4 * (r - rbar) / rbar
      Bm25.scoredAll(docs.filter(col(shardCol) === lit(shard)),
          idCol, textCol, query)
        .select(col("doc"), lit(shard).as("shard"),
          (col("score") * lit(weight)).as("score"))
    }
    perShard.reduce(_.unionByName(_))
      .select(col("doc"), col("shard"), round(col("score"), 4).as("score"))
      .orderBy(desc("score"), asc("doc"))
      .limit(k)
  }
}
