package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sketch.Hll

/** HyperBall / HyperANF (Boldi, Rosa & Vigna, WWW 2011; Boldi & Vigna
  * 2013): the approximate NEIGHBORHOOD FUNCTION — per vertex, the size of
  * the out-ball B(v, t) = |{u : dist(v, u) ≤ t}| — computed with one HLL
  * sketch per vertex instead of one visited-set per vertex. The exact
  * computation is |V| BFS runs (10⁹ vertices → hopeless); the sketch form
  * is t rounds of register max-merge along edges, the published algorithm
  * behind web-graph distance distributions, closeness/harmonic centrality
  * and "effective diameter" at crawl scale.
  *
  * Iteration (register-wise): R₀(v) = HLL({v}); R_{t+1}(v) = max(R_t(v),
  * max over edges (v,u) of R_t(u)). Since HLL registers of a union ARE the
  * elementwise max ([[Hll.merge]]'s exactness property), R_t(v) equals the
  * registers of the true ball membership set at every round — not an
  * approximation OF the iteration, only of the final cardinality readout.
  *
  * Determinism contract: registers are integers derived from md5
  * ([[Hll]] layout) and max-merge is order/partitioning-insensitive, so
  * the whole trajectory is hash-exact across engines with NO float
  * contract; the gate pins the integer summary columns (present,
  * s_scaled, est_milli).
  *
  * Plan shape per round: ONE equi-join shuffle (registers keyed by the
  * edge dst) + one (v, j) aggregate with map-side partial max;
  * `localCheckpoint` per round truncates the iterative lineage (the
  * round-3 lesson). State is ≤ min(|ball|, 256) rows per vertex — the
  * sketch, not the ball, is what travels. Multi-edges and self-loops are
  * harmless (max is duplicate-insensitive) so no distinct pass is paid.
  */
object HyperBall {

  /** Per-vertex ball register table `(key, j, m)` after `radius` rounds;
    * `key` is the vertex id cast to string ([[Hll]] key convention).
    * Vertices = src ∪ dst of `edges` (src/dst columns). */
  def registers(edges: DataFrame, radius: Int,
                driverEdgeLimit: Long = 1L << 18): DataFrame = {
    require(radius >= 0, s"radius $radius")
    val e = edges.select(col("src").cast("string").as("src"),
      col("dst").cast("string").as("dst")).localCheckpoint()
    val verts = e.select(col("src").as("v"))
      .union(e.select(col("dst").as("v"))).distinct()
    var r = Hll.registers(verts.select(col("v").as("k"), col("v")), "k", "v")
      .localCheckpoint()
    // size-gated driver merge rounds (the PageRank.driverLoop precedent):
    // the INITIAL registers still come from the distributed Hll pipeline
    // (no hash replication), and the rounds are pure integer max-merges —
    // order-insensitive, so the in-memory fold equals the distributed
    // aggregate exactly (HyperBallSpec pins path parity).
    if (e.count() <= driverEdgeLimit && r.count() <= driverEdgeLimit)
      return driverRounds(e, r, radius)
    var t = 0
    while (t < radius) {
      val fromNbrs = e.join(r, col("key") === col("dst"))
        .select(col("src").as("key"), col("j"), col("m"))
      val next = r.unionByName(fromNbrs)
        .groupBy("key", "j").agg(max("m").as("m"))
        .localCheckpoint()
      graft.Lineage.dropCheckpoint(r)
      r = next
      t += 1
    }
    r
  }

  /** Driver replica of the max-merge rounds: next(v, j) = max(r(v, j),
    * r(u, j) over edges (v, u)) — registers absent on a side simply don't
    * contribute, exactly like the unionByName + max aggregate. */
  private def driverRounds(e: DataFrame, r0: DataFrame, radius: Int): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val es = e.select(col("src"), col("dst")).as[(String, String)].collect()
    var r = scala.collection.mutable.HashMap.empty[(String, Int), Int]
    r0.select(col("key"), col("j"), col("m")).as[(String, Int, Int)].collect()
      .foreach { case (k, j, m) =>
        val key = (k, j)
        if (m > r.getOrElse(key, Int.MinValue)) r.update(key, m)
      }
    var t = 0
    while (t < radius) {
      // group the previous round's registers per vertex, then push each
      // dst's registers to src with a max-merge
      val byV = r.toSeq.groupBy(_._1._1)
      val next = scala.collection.mutable.HashMap.empty[(String, Int), Int]
      r.foreach { case (k, m) => next.update(k, m) }
      es.foreach { case (src, dst) =>
        byV.getOrElse(dst, Nil).foreach { case ((_, j), m) =>
          val key = (src, j)
          if (m > next.getOrElse(key, Int.MinValue)) next.update(key, m)
        }
      }
      r = next
      t += 1
    }
    r.toSeq.map { case ((k, j), m) => (k, j, m) }.toDF("key", "j", "m")
  }

  /** Per-vertex ball-size summary `(v, present, s_scaled, est_milli,
    * est)` — [[Hll.summarize]] over [[registers]]; integer columns are
    * cross-engine exact, `est` is the user-facing corrected double. */
  def run(edges: DataFrame, radius: Int): DataFrame =
    Hll.summarize(registers(edges, radius)).withColumnRenamed("key", "v")

}
