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
  def run(edges: DataFrame, nodes: DataFrame, iters: Int,
          driverEdgeLimit: Long = 1L << 18): DataFrame = {
    require(iters >= 1, s"iters $iters")
    val d = edges.select(col("src"), col("dst"))
    val e = d.union(d.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    // size-gated driver rounds (the PageRank.driverLoop precedent): the
    // synchronous majority update with the (count DESC, label ASC) tie
    // order is pure integer voting — the in-memory replica plays the same
    // rounds (LabelPropSpec pins path parity); big graphs run below.
    val longIds = e.schema.forall(_.dataType ==
        org.apache.spark.sql.types.LongType) &&
      nodes.schema.head.dataType == org.apache.spark.sql.types.LongType
    if (longIds && e.count() <= driverEdgeLimit) {
      val nds = nodes.select(col("id")).localCheckpoint()
      if (nds.count() <= driverEdgeLimit)
        return driverRounds(e, nds, iters)
    }
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

  /** Driver replica of the synchronous rounds: votes(dst)(label) += 1 per
    * symmetrized edge whose src holds a label (only node-domain ids do —
    * the join semantics); argmax by (count DESC, label ASC); nodes with no
    * votes keep their previous label. Multi-edges count multiply (the
    * edge array is the multiset). */
  private def driverRounds(e: DataFrame, nds: DataFrame, iters: Int): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val es = e.select(col("src"), col("dst")).as[(Long, Long)].collect()
    val ids = nds.select(col("id")).as[Long].collect()
    var l = scala.collection.mutable.LongMap.empty[Long]
    ids.foreach(id => l.update(id, id))
    for (_ <- 1 to iters) {
      val votes = scala.collection.mutable.LongMap
        .empty[scala.collection.mutable.LongMap[Long]]
      es.foreach { case (src, dst) =>
        l.get(src).foreach { lab =>
          val v = votes.getOrElseUpdate(dst, scala.collection.mutable.LongMap.empty[Long])
          v.update(lab, v.getOrElse(lab, 0L) + 1L)
        }
      }
      val next = scala.collection.mutable.LongMap.empty[Long]
      ids.foreach { id =>
        votes.get(id) match {
          case Some(v) if v.nonEmpty =>
            var bestLab = Long.MinValue; var bestC = Long.MinValue
            v.foreach { case (lab, c) =>
              if (c > bestC || (c == bestC && lab < bestLab)) { bestC = c; bestLab = lab }
            }
            next.update(id, bestLab)
          case _ => next.update(id, l(id))
        }
      }
      l = next
    }
    ids.toSeq.map(id => (id, l(id))).toDF("id", "label")
  }
}
