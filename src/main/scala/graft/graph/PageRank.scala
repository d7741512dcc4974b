package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Crawl-graph centrality — PageRank (Brin & Page 1998, published
  * formula, public knowledge) in EXACT INTEGER arithmetic: the
  * link-graph quality signal web-scale pipelines use to weight or
  * prioritize documents (the same family as the harmonic-centrality host
  * rankings Common Crawl publishes).
  *
  * Determinism contract: ranks are 64-bit integer mass units, never
  * doubles. Each node starts with `base` units; per iteration a node
  * sends floor(rank · dampNum / (dampDen · outdeg)) units down each
  * out-edge and every node is topped up with the teleport share
  * base · (dampDen − dampNum) / dampDen. Floor remainders (and the mass
  * of dangling nodes) dissipate — the deterministic-integer analog of
  * damping leakage; totals shrink slightly but the RANKING is the
  * product, and every unit is reproducible bit-for-bit on any engine and
  * any partitioning (integer sums are order-independent — no float
  * summation contract needed, unlike the LM/DSIR operators).
  *
  * Default damping dampNum/dampDen = 17/20 = 0.85, the published value.
  *
  * Overflow headroom: a node's rank is bounded by teleport + dampNum/
  * dampDen · (total in-flow) ≤ n · base in the worst case; rank · dampNum
  * must stay under 2^63 — with base = 10^12 and dampNum = 17 that allows
  * corpora beyond 10^5 nodes per rank unit choice; pick a smaller `base`
  * for billion-node graphs (precision scales with base, overflow with
  * base · n).
  *
  * Plan shape (per iteration): ONE shuffle keyed on the edge destination
  * (the contribution aggregate) plus the rank join keyed on src — both
  * on high-cardinality node ids; the out-degree table is computed once
  * and rides with the edges. `localCheckpoint` truncates lineage every
  * iteration (an iterative self-join without it re-analyzes an
  * exponentially growing plan — the round-3 pointer-jumping lesson).
  */
object PageRank {

  /** (id, rank) after `iters` iterations. `edges` is (src, dst) — multi
    * edges count multiply, self-loops are legal; `nodes` is (id) and
    * must cover every id that should receive teleport mass. Nodes
    * without out-edges are dangling: their non-teleport mass dissipates
    * (the standard simplification; redistribute-to-all would couple every
    * partition through a scalar — a deliberate scale trade, documented).
    */
  def run(edges: DataFrame, nodes: DataFrame, iters: Int,
          base: Long = 1000000000000L,
          dampNum: Long = 17L, dampDen: Long = 20L): DataFrame = {
    require(iters >= 0 && dampNum >= 0 && dampDen > dampNum,
      s"bad damping $dampNum/$dampDen or iters $iters")
    val teleport = base / dampDen * (dampDen - dampNum)
    // out-degrees ride with the edges; computed once, reused every round
    val ed = edges
      .join(edges.groupBy("src").agg(count(lit(1)).as("outdeg")), Seq("src"))
      .select(col("src"), col("dst"), col("outdeg"))
      .localCheckpoint()
    var r = nodes.select(col("id"), lit(base).as("rank"))
    for (_ <- 1 to iters) {
      // integer `div`, NOT `/`: Spark's / returns double, and rank·17
      // exceeds 2^53 where doubles silently lose unit exactness
      val contrib = ed.join(r, ed("src") === r("id"))
        .select(col("dst").as("id"),
          expr(s"(rank * ${dampNum}L) div (${dampDen}L * outdeg)").as("c"))
        .groupBy("id").agg(sum("c").as("inflow"))
      r = nodes.select(col("id"))
        .join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(teleport) + coalesce(col("inflow"), lit(0L))).as("rank"))
        .localCheckpoint()
    }
    r
  }
}
