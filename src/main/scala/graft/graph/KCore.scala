package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition (Seidman, Social Networks 1983; distributed
  * synchronized peel à la Batagelj–Zaveršnik) — the classic crawl-graph
  * density filter: the k-core is the maximal subgraph where every vertex
  * keeps degree ≥ k, the standard cheap cut between densely-interlinked
  * hub clusters and the long tail of weakly-linked pages.
  *
  * Determinism contract: the k-core is CONFLUENT — the fixpoint is unique
  * regardless of peel order — and this implementation peels in SYNCHRONIZED
  * rounds (every round drops ALL vertices whose degree in the current
  * subgraph is < k), so any engine replaying the same rounds lands on
  * identical intermediate states too. Integer end-to-end: no float
  * contract, hash-exact on any partitioning.
  *
  * Edge semantics: the input (src, dst) relation is normalized to a SIMPLE
  * UNDIRECTED graph — self-loops dropped, parallel/reciprocal edges
  * collapsed — before peeling (degree means "distinct neighbours", the
  * published definition).
  *
  * Plan shape (per round): one aggregate shuffle for degrees (map-side
  * combine, narrow long keys), then two equi-join semi-filters against the
  * survivor set; `localCheckpoint` per round truncates the iterative
  * lineage (the round-3 pointer-jumping lesson) and convergence rides the
  * checkpoint's own materialization via `observe` (edge-count unchanged ⟺
  * no vertex dropped, since every peeled vertex had ≥ 1 incident edge —
  * degree-0 vertices never enter the edge relation at all). Safe from the
  * AQE metrics-culling pitfall: the CollectMetrics node is the
  * checkpoint's root, nothing downstream can empty it away. */
object KCore {

  /** (id, core_deg) for every vertex of the k-core of the simple
    * undirected graph induced by `edges` (src, dst); vertices outside the
    * core (including isolated ones) are absent. `core_deg` is the vertex's
    * degree WITHIN the core (≥ k by construction). */
  def run(edges: DataFrame, k: Int, maxIter: Int = 100,
          driverEdgeLimit: Long = 1L << 18): DataFrame = {
    require(k >= 1, s"k $k")
    val d = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).where(col("src") =!= col("dst"))
    val und = d.select(least(col("src"), col("dst")).as("a"),
      greatest(col("src"), col("dst")).as("b")).distinct()
    var e = und.select(col("a").as("src"), col("b").as("dst"))
      .union(und.select(col("b").as("src"), col("a").as("dst")))
      .localCheckpoint()
    var cnt = e.count()
    // size-gated driver peel (the PageRank.driverLoop precedent): the
    // k-core fixpoint is confluent AND this replica peels the same
    // synchronized rounds, so the surviving edge set — an integer set
    // fixpoint, no arithmetic at all — is identical (KCoreSpec pins
    // path parity). Larger graphs run the distributed loop below.
    if (cnt <= driverEdgeLimit)
      return driverPeel(e, k, maxIter)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter && cnt > 0) {
      val keep = e.groupBy("src").agg(count(lit(1)).as("deg"))
        .where(col("deg") >= k)
      val obs = org.apache.spark.sql.Observation()
      val next = e.join(keep.select(col("src")), "src")
        .join(keep.select(col("src").as("dst")), "dst")
        .select("src", "dst")
        .observe(obs, coalesce(count(lit(1)), lit(0L)).as("edges"))
        .localCheckpoint()
      val newCnt = obs.get("edges").asInstanceOf[Long]
      converged = newCnt == cnt
      val prev = e
      e = next
      cnt = newCnt
      iter += 1
      graft.Lineage.dropCheckpoint(prev)
    }
    e.groupBy("src").agg(count(lit(1)).as("core_deg"))
      .select(col("src").as("id"), col("core_deg"))
  }

  /** Driver replica of the synchronized peel over the already-normalized
    * DIRECTED-both-ways simple edge array: per round keep vertices with
    * degree ≥ k, keep edges with BOTH endpoints kept, stop when the edge
    * count is unchanged (or maxIter, matching the distributed bound). */
  private def driverPeel(e: DataFrame, k: Int, maxIter: Int): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    var es = e.select(col("src"), col("dst")).as[(Long, Long)].collect()
    var iter = 0
    var converged = es.isEmpty
    while (!converged && iter < maxIter) {
      val deg = scala.collection.mutable.LongMap.empty[Long]
      es.foreach { case (src, _) => deg.update(src, deg.getOrElse(src, 0L) + 1L) }
      val next = es.filter { case (src, dst) =>
        deg.getOrElse(src, 0L) >= k && deg.getOrElse(dst, 0L) >= k }
      converged = next.length == es.length
      es = next
      iter += 1
      if (es.isEmpty) converged = true
    }
    val core = scala.collection.mutable.LongMap.empty[Long]
    es.foreach { case (src, _) => core.update(src, core.getOrElse(src, 0L) + 1L) }
    core.toSeq.map { case (id, d) => (id, d) }.toDF("id", "core_deg")
  }
}
