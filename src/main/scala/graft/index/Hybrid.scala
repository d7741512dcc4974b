package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion of heterogeneous retrieval lists — the hybrid
  * lexical ⊕ vector search the reference approximates by running Chroma
  * vector top-k alongside keyword filtering (SURVEY.md §2.8 R2/R3;
  * reference: question_rag.py:130-194 filtered get → ranked flow,
  * chroma HNSW top-k convert_to_embeddings.py:524).
  *
  * RRF (Cormack, Clarke & Büttcher, SIGIR'09 — published formula):
  * `score(d) = Σ_lists 1 / (k0 + rank_list(d))`, k0 = 60. Rank-based
  * fusion needs no score calibration between BM25 logs and cosine space,
  * which is exactly why it is the standard hybrid-search combiner.
  *
  * Determinism contract: ranks are integers (ties broken by doc id asc),
  * and the fused score is computed from the pivoted per-list ranks in
  * FIXED list-declaration order — so the float addition order is
  * engine-identical and the oracle reproduces the double bit-for-bit.
  * Never fuse by summing rows of an unordered union: a 3-list GROUP BY
  * sum re-associates addition in partition order.
  *
  * Scale shape (100 TB): the single-query form takes each list's top n via
  * `orderBy().limit(n)` — Spark plans TakeOrderedAndProject, a map-side
  * partial top-k with an O(n·parts) driver merge, never a global sort.
  * Ranking the surviving ≤ n rows is a single-task window over n rows by
  * construction. The per-query form keys every window by `qid` so a batch
  * of thousands of queries shuffles once on qid and the rank caps run as
  * WindowGroupLimit (map-side truncation before the exchange).
  */
object Hybrid {

  /** SIGIR'09 constant; frozen. */
  val K0 = 60

  /** One retrieval leg: a relation plus its (doc, score) columns. Higher
    * score = better; ties broken by doc asc. */
  final case class Leg(name: String, df: DataFrame, docCol: String, scoreCol: String)

  /** Top-n of one leg as (doc, rank 1..n). TakeOrderedAndProject shape. */
  def topN(leg: Leg, n: Int): DataFrame = {
    val capped = leg.df
      .select(col(leg.docCol).cast("long").as("doc"), col(leg.scoreCol).as("s"))
      .orderBy(col("s").desc, col("doc").asc)
      .limit(n)
    capped
      .withColumn("rank", row_number().over(Window.orderBy(col("s").desc, col("doc").asc)))
      .select(col("doc"), col("rank"))
  }

  private def rankCols(legs: Seq[Leg]) = legs.map(l =>
    max(when(col("list") === l.name, col("rank"))).as(s"r_${l.name}"))

  /** Fuse N legs: (doc, r_<name>... , rrf). Docs appearing in any leg's
    * top-n survive; absent legs contribute 0 to the fused score and a NULL
    * rank column. One shuffle (the groupBy on doc). */
  def rrf(legs: Seq[Leg], n: Int): DataFrame = {
    require(legs.nonEmpty && legs.map(_.name).distinct.size == legs.size,
      "legs must be non-empty with distinct names")
    val tagged = legs.map(l => topN(l, n).withColumn("list", lit(l.name)))
    val pivoted = tagged.reduce(_ unionByName _)
      .groupBy("doc")
      .agg(rankCols(legs).head, rankCols(legs).tail: _*)
    // fixed-order fold: ((0 + t1) + t2) + ... — same association both engines
    val fused = legs.foldLeft(lit(0.0)) { (acc, l) =>
      acc + coalesce(lit(1.0) / (lit(K0) + col(s"r_${l.name}").cast("double")), lit(0.0))
    }
    pivoted.withColumn("rrf", round(fused, 6))
  }

  /** Per-query variant: every leg carries a `qid`; rank windows are keyed
    * by qid so a query batch is one qid-partitioned shuffle and the
    * `rank <= n` filter runs as WindowGroupLimit (map-side truncation). */
  def rrfPerQuery(legs: Seq[Leg], qidCol: String, n: Int): DataFrame = {
    require(legs.nonEmpty && legs.map(_.name).distinct.size == legs.size,
      "legs must be non-empty with distinct names")
    val tagged = legs.map { l =>
      val w = Window.partitionBy(col("qid")).orderBy(col("s").desc, col("doc").asc)
      l.df.select(col(qidCol).as("qid"),
          col(l.docCol).cast("long").as("doc"), col(l.scoreCol).as("s"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= n)
        .select(col("qid"), col("doc"), col("rank"), lit(l.name).as("list"))
    }
    val pivoted = tagged.reduce(_ unionByName _)
      .groupBy("qid", "doc")
      .agg(rankCols(legs).head, rankCols(legs).tail: _*)
    val fused = legs.foldLeft(lit(0.0)) { (acc, l) =>
      acc + coalesce(lit(1.0) / (lit(K0) + col(s"r_${l.name}").cast("double")), lit(0.0))
    }
    pivoted.withColumn("rrf", round(fused, 6))
  }
}
