package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Label propagation communities (Raghavan, Albert & Kumara, Phys. Rev. E
  * 2007 — published method): the classic near-linear community detector for
  * crawl/link graphs, distinct from connected components (labels follow
  * MAJORITY structure, so a bridge edge between two dense clusters does not
  * merge them the way CC must).
  *
  * Determinism contract: SYNCHRONOUS rounds with a total tie order — every
  * node simultaneously adopts the label that is most frequent among its
  * neighbors in the PREVIOUS round, ties broken by the smallest label. The
  * published asynchronous sweep is order-dependent (results vary run to
  * run); the synchronous form is a pure function of (edges, iters) and
  * integer end-to-end — bit-exact on any engine and any partitioning, no
  * float contract. (Known synchronous-LPA property: bipartite structures
  * can oscillate with period 2 — callers pick `iters`, and the gate
  * replays the SAME unrolled rounds in the oracle, so oscillation is not a
  * correctness hazard here.)
  *
  * Edge semantics: the input (src, dst) relation is symmetrized internally
  * (classic LPA is undirected); multi-edges count multiply, self-loops
  * vote for the node's own previous label — same multiset semantics as
  * [[PageRank]]/[[Hits]].
  *
  * Plan shape (per round): one equi-join shuffle of edges against the
  * previous labels keyed on src, then TWO aggregate shuffles — (dst,
  * label) vote counts, then the per-dst argmax as `max(struct(count,
  * -label))` (an ordinary partial-aggregable max, NOT a window — map-side
  * combine keeps the shuffle narrow at any degree skew); `localCheckpoint`
  * per round truncates the iterative lineage (the round-3 pointer-jumping
  * lesson). Isolated nodes keep their previous label via a left join.
  */
object LabelProp {

  /** (id, label) after `iters` synchronous majority rounds over the
    * symmetrized `edges` (src, dst); `nodes` (id) fixes the output domain
    * and the initial labels (label₀ = id). */
  def run(edges: DataFrame, nodes: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iters $iters")
    val d = edges.select(col("src"), col("dst"))
    val e = d.union(d.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    var l = nodes.select(col("id"), col("id").cast("long").as("label"))
    for (_ <- 1 to iters) {
      val upd = e.join(l, e("src") === l("id"))
        .groupBy(e("dst").as("id"), col("label"))
        .agg(count(lit(1)).as("c"))
        // argmax by (count DESC, label ASC): max over (c, -label) structs
        .groupBy(col("id"))
        .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
        .select(col("id"), (-col("m.nl")).as("label"))
      l = l.select(col("id"), col("label").as("prev"))
        .join(upd, Seq("id"), "left")
        .select(col("id"), coalesce(col("label"), col("prev")).as("label"))
        .localCheckpoint()
    }
    l
  }
}
