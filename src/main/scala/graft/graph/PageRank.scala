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
    * edges count multiply, self-loops are legal; `nodes` is (id), must be
    * UNIQUE ids, and must cover every id that should receive teleport
    * mass. Nodes without out-edges are dangling: their non-teleport mass
    * dissipates (the standard simplification; redistribute-to-all would
    * couple every partition through a scalar — a deliberate scale trade,
    * documented).
    */
  def run(edges: DataFrame, nodes: DataFrame, iters: Int,
          base: Long = 1000000000000L,
          dampNum: Long = 17L, dampDen: Long = 20L,
          driverEdgeLimit: Long = 1L << 18): DataFrame = {
    require(iters >= 0 && dampNum >= 0 && dampDen > dampNum,
      s"bad damping $dampNum/$dampDen or iters $iters")
    val teleport = base / dampDen * (dampDen - dampNum)
    // WEIGHTED edge aggregation: w parallel (src, dst) multi-edges each
    // contribute the IDENTICAL floor((rank·dampNum)/(dampDen·outdeg)) —
    // the per-edge value depends only on src — so collapsing them to one
    // (src, dst, w) row and multiplying by w is bit-exact while shuffling
    // |distinct pairs| rows per iteration instead of |multi-edges|
    // (multi-edge-heavy graphs like TextRank's shared-term sentence graph
    // shrink several-fold). outdeg = Σw keeps multi-edge semantics.
    val ew = edges.groupBy("src", "dst").agg(count(lit(1)).as("w"))
    // out-degrees ride with the edges; computed once, reused every round
    val ed = ew
      .join(ew.groupBy("src").agg(sum("w").as("outdeg")), Seq("src"))
      .select(col("src"), col("dst"), col("w"), col("outdeg"))
      .localCheckpoint()
    // SIZE-GATED driver loop (the Components.driverUnionFind precedent):
    // the distributed loop costs ~6 scheduled one-task jobs per iteration
    // at small-graph sizes — pure fixed overhead. A weighted edge set AND
    // node set at or under `driverEdgeLimit` rows (tens of MB of longs —
    // far from driver-heap pressure) iterate in driver arrays instead,
    // with the IDENTICAL integer recurrence (64-bit sums are
    // order-independent, so the array fold and the distributed aggregate
    // are bit-equal — PageRankSpec pins path parity). Larger graphs run
    // the distributed loop below, unchanged.
    val nds = nodes.select(col("id")).localCheckpoint()
    val longIds = ed.schema.take(2).forall(_.dataType ==
        org.apache.spark.sql.types.LongType) &&
      nds.schema.head.dataType == org.apache.spark.sql.types.LongType
    if (longIds && ed.count() <= driverEdgeLimit && nds.count() <= driverEdgeLimit)
      return driverLoop(ed, nds, iters, base, teleport, dampNum, dampDen)
    var r = nds.select(col("id"), lit(base).as("rank"))
    for (_ <- 1 to iters) {
      // integer `div`, NOT `/`: Spark's / returns double, and rank·17
      // exceeds 2^53 where doubles silently lose unit exactness
      val contrib = ed.join(r, ed("src") === r("id"))
        .select(col("dst").as("id"),
          expr(s"w * ((rank * ${dampNum}L) div (${dampDen}L * outdeg))").as("c"))
        .groupBy("id").agg(sum("c").as("inflow"))
      r = nds
        .join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(teleport) + coalesce(col("inflow"), lit(0L))).as("rank"))
        .localCheckpoint()
    }
    r
  }

  /** The exact integer recurrence in driver arrays: teleport +
    * Σ_in-edges w·floor((rank·dampNum)/(dampDen·outdeg)) per node per
    * round — identical values to the distributed loop (integer adds
    * commute; floor-per-src is per-edge-set constant). Only ids present
    * in `nds` receive teleport/output, matching the distributed left
    * join; edges from ids OUTSIDE nds contribute with initial rank
    * `base` at iteration 1 exactly as the distributed src-join does
    * (r starts as nds — a non-node src simply never matches, and
    * likewise here such an edge finds no rank entry and is skipped,
    * also matching). */
  private def driverLoop(ed: DataFrame, nds: DataFrame, iters: Int,
                         base: Long, teleport: Long,
                         dampNum: Long, dampDen: Long): DataFrame = {
    val spark = ed.sparkSession
    import spark.implicits._
    val es = ed.select(col("src"), col("dst"), col("w"), col("outdeg"))
      .as[(Long, Long, Long, Long)].collect()
    val ids = nds.select(col("id")).as[Long].collect()
    // ranks stay strictly positive (teleport > 0, inflow >= 0), so the
    // distributed `div` and plain long division agree (no negative-floor
    // divergence is reachable)
    var rank = scala.collection.mutable.LongMap.empty[Long]
    ids.foreach(id => rank.update(id, base))
    for (_ <- 1 to iters) {
      val inflow = scala.collection.mutable.LongMap.empty[Long]
      var i = 0
      while (i < es.length) {
        val (src, dst, w, outdeg) = es(i)
        rank.get(src) match {
          case Some(r) =>
            val c = w * ((r * dampNum) / (dampDen * outdeg))
            inflow.update(dst, inflow.getOrElse(dst, 0L) + c)
          case None => // src outside the node set: no rank, no contribution
        }
        i += 1
      }
      val next = scala.collection.mutable.LongMap.empty[Long]
      ids.foreach(id => next.update(id, teleport + inflow.getOrElse(id, 0L)))
      rank = next
    }
    ids.toSeq.map(id => (id, rank(id))).toDF("id", "rank")
  }
}
