package graft

import graft.graph.LabelProp

/** Synchronous LPA: hand-computed rounds, bridge-does-not-merge,
  * partition invariance, multi-edge vote weight. */
class LabelPropSpec extends SparkSuiteBase {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], nodes: Seq[Long], iters: Int,
                  parts: Int = 4) =
    LabelProp.run(edges.toDF("src", "dst").repartition(parts),
        nodes.toDF("id"), iters)
      .as[(Long, Long)].collect().toMap

  // two triangles {0,1,2} and {3,4,5} joined by one bridge edge 2-3
  private val bridged = Seq(0L -> 1L, 1L -> 2L, 0L -> 2L,
    3L -> 4L, 4L -> 5L, 3L -> 5L, 2L -> 3L)

  test("one round: every node adopts its min neighbour id") {
    // l0 = id; nbrs(0)={1,2}→1, nbrs(1)={0,2}→0, nbrs(2)={0,1,3}→0,
    // nbrs(3)={2,4,5}→2, nbrs(4)={3,5}→3, nbrs(5)={3,4}→3
    assert(run(bridged, 0L to 5L, 1) ==
      Map(0L -> 1L, 1L -> 0L, 2L -> 0L, 3L -> 2L, 4L -> 3L, 5L -> 3L))
  }

  test("bridge edge does NOT merge the two dense clusters (unlike CC)") {
    // hand-rolled rounds: l2=[0,0,0,3,2,2], l3=[0,0,0,2,2,2], l4 stable —
    // cluster A settles on 0, cluster B on 2; connected components would
    // have returned a single label for all six nodes
    val l4 = run(bridged, 0L to 5L, 4)
    assert(l4 == Map(0L -> 0L, 1L -> 0L, 2L -> 0L,
      3L -> 2L, 4L -> 2L, 5L -> 2L))
  }

  test("pure function of (edges, iters): partitioning does not matter") {
    assert(run(bridged, 0L to 5L, 3, parts = 1) ==
      run(bridged, 0L to 5L, 3, parts = 7))
  }

  test("multi-edges vote multiply; isolated node keeps its own label") {
    // doubled 1-2 edge outvotes the single 1-0 edge at node 1:
    // nbrs(1) = {0, 2, 2} → label 2 (count 2 beats count 1 despite 0 < 2)
    val edges = Seq(1L -> 2L, 1L -> 2L, 0L -> 1L)
    val l1 = run(edges, Seq(0L, 1L, 2L, 9L), 1)
    assert(l1(1L) == 2L)
    assert(l1(9L) == 9L) // isolated: left-join coalesce keeps previous
  }

  test("self-loop votes for the node's own previous label") {
    // node 1: nbrs {0, 1} (self-loop symmetrizes to two 1→1 votes) — its
    // own label 1 gets 2 votes vs one for 0
    val edges = Seq(0L -> 1L, 1L -> 1L)
    assert(run(edges, Seq(0L, 1L), 1)(1L) == 1L)
  }

  test("driver fast-path equals the forced distributed rounds") {
    val driver = run(bridged, 0L to 5L, 3)
    val dist = LabelProp.run(bridged.toDF("src", "dst"),
        (0L to 5L).toDF("id"), 3, driverEdgeLimit = 0L)
      .as[(Long, Long)].collect().toMap
    assert(driver == dist)
  }
}
