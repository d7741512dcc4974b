package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS hubs/authorities (Kleinberg, "Authoritative sources in a
  * hyperlinked environment", JACM 1999 — published method): the second
  * classic crawl-graph centrality beside [[PageRank]]. One power round is
  * `a ← Aᵀh` then `h ← A·a` (the authority update feeds the hub update,
  * Kleinberg's order).
  *
  * Determinism contract: UNNORMALIZED integer iteration. The published
  * form L2-normalizes each round — a global float reduction whose only
  * effect is a per-round scalar; rankings and score RATIOS are identical
  * without it. Dropping it makes every value an integer sum of integer
  * terms: bit-exact on any engine and any partitioning (the PageRank
  * scaled-integer discipline — no float contract, no rounding clauses).
  * Magnitudes grow as (max degree)^(2·iters); BIGINT holds iters ≤ 4 for
  * any graph with degrees ≤ ~2000 — pick `iters` accordingly (the
  * published observation is that rankings stabilize within a few rounds).
  *
  * Plan shape (per round): TWO aggregate shuffles, each keyed on a
  * high-cardinality node id (dst for the authority sum, src for the hub
  * sum) joined against the checkpointed edge relation; `localCheckpoint`
  * per round truncates the iterative-plan lineage (the round-3
  * pointer-jumping lesson). Multi-edges count multiply, self-loops are
  * legal — same edge semantics as [[PageRank]].
  */
object Hits {

  /** (id, auth, hub) after `iters` full (authority-then-hub) rounds over
    * `edges` (src, dst); `nodes` (id) fixes the output domain — nodes with
    * no in-edges keep auth 0, no out-edges hub 0. */
  def run(edges: DataFrame, nodes: DataFrame, iters: Int,
          driverEdgeLimit: Long = 1L << 18): DataFrame = {
    require(iters >= 1, s"iters $iters")
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    // size-gated driver loop (the PageRank.driverLoop precedent):
    // integer sums are order-free, so the in-memory fold equals the
    // distributed aggregates bit-for-bit (HitsSpec pins path parity)
    val longIds = e.schema.forall(_.dataType ==
        org.apache.spark.sql.types.LongType) &&
      nodes.schema.head.dataType == org.apache.spark.sql.types.LongType
    if (longIds && e.count() <= driverEdgeLimit) {
      val nds = nodes.select(col("id")).localCheckpoint()
      if (nds.count() <= driverEdgeLimit)
        return driverLoop(e, nds, iters)
    }
    // h_0 = 1 on every node that can send (edge sources)
    var h = e.select(col("src").as("id")).distinct()
      .select(col("id"), lit(1L).as("s"))
    var a: DataFrame = null
    for (_ <- 1 to iters) {
      a = e.join(h, e("src") === h("id"))
        .groupBy(e("dst").as("id")).agg(sum(col("s")).as("s"))
        .localCheckpoint()
      h = e.join(a, e("dst") === a("id"))
        .groupBy(e("src").as("id")).agg(sum(col("s")).as("s"))
        .localCheckpoint()
    }
    nodes.select(col("id"))
      .join(a.select(col("id"), col("s").as("auth")), Seq("id"), "left")
      .join(h.select(col("id"), col("s").as("hub")), Seq("id"), "left")
      .select(col("id"),
        coalesce(col("auth"), lit(0L)).as("auth"),
        coalesce(col("hub"), lit(0L)).as("hub"))
  }

  /** Driver replica of the unnormalized power rounds: h₀ = 1 per distinct
    * edge source; a(dst) = Σ h(src), then h(src) = Σ a(dst) — edges whose
    * counterpart holds no score contribute nothing (the join semantics);
    * the final left joins give absent nodes 0. Multi-edges count multiply
    * (the edge array is the multiset). */
  private def driverLoop(e: DataFrame, nds: DataFrame, iters: Int): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val es = e.select(col("src"), col("dst")).as[(Long, Long)].collect()
    val ids = nds.select(col("id")).as[Long].collect()
    var h = scala.collection.mutable.LongMap.empty[Long]
    es.foreach { case (src, _) => h.update(src, 1L) }
    var a = scala.collection.mutable.LongMap.empty[Long]
    for (_ <- 1 to iters) {
      val na = scala.collection.mutable.LongMap.empty[Long]
      es.foreach { case (src, dst) =>
        h.get(src).foreach(s => na.update(dst, na.getOrElse(dst, 0L) + s)) }
      a = na
      val nh = scala.collection.mutable.LongMap.empty[Long]
      es.foreach { case (src, dst) =>
        a.get(dst).foreach(s => nh.update(src, nh.getOrElse(src, 0L) + s)) }
      h = nh
    }
    ids.toSeq.map(id =>
      (id, a.getOrElse(id, 0L), h.getOrElse(id, 0L))).toDF("id", "auth", "hub")
  }
}
