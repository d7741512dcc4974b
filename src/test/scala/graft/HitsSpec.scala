package graft

import graft.graph.Hits

/** Integer HITS: hand-computed rounds on a small graph, multi-edge
  * semantics, output-domain coverage. */
class HitsSpec extends SparkSuiteBase {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], nodes: Seq[Long], iters: Int) =
    Hits.run(edges.toDF("src", "dst"), nodes.toDF("id"), iters)
      .as[(Long, Long, Long)].collect().toSet

  test("one round: authority = in-neighbour count, hub = sum of pointed authorities") {
    val edges = Seq(1L -> 2L, 1L -> 3L, 2L -> 3L, 4L -> 1L)
    // h0 = 1 on {1,2,4}; a1: 2←1, 3←{1,2}, 1←4; h1: 1→a(2)+a(3)=3,
    // 2→a(3)=2, 4→a(1)=1
    assert(run(edges, Seq(1L, 2L, 3L, 4L), 1) == Set(
      (1L, 1L, 3L), (2L, 1L, 2L), (3L, 2L, 0L), (4L, 0L, 1L)))
  }

  test("two rounds: the a2/h2 chain, isolated node kept at zero") {
    val edges = Seq(1L -> 2L, 1L -> 3L, 2L -> 3L, 4L -> 1L)
    // a2: 2←h1(1)=3, 3←h1(1)+h1(2)=5, 1←h1(4)=1
    // h2: 1→a2(2)+a2(3)=8, 2→a2(3)=5, 4→a2(1)=1; node 9 isolated
    assert(run(edges, Seq(1L, 2L, 3L, 4L, 9L), 2) == Set(
      (1L, 1L, 8L), (2L, 3L, 5L), (3L, 5L, 0L), (4L, 0L, 1L), (9L, 0L, 0L)))
  }

  test("multi-edges count multiply, self-loops legal") {
    // doubled 1→2: a1(2) = 2 (two in-edges), and h1(1) sums a1(2) over
    // BOTH parallel edges = 4; 3→3 self-loop gives node 3 a and h of 1
    val edges = Seq(1L -> 2L, 1L -> 2L, 3L -> 3L)
    assert(run(edges, Seq(1L, 2L, 3L), 1) == Set(
      (1L, 0L, 4L), (2L, 2L, 0L), (3L, 1L, 1L)))
  }

  test("driver fast-path equals the forced distributed loop") {
    val edges = Seq(1L -> 2L, 1L -> 3L, 2L -> 3L, 4L -> 1L, 1L -> 2L)
    val nodes = Seq(1L, 2L, 3L, 4L, 9L)
    val driver = run(edges, nodes, 3)
    val dist = Hits.run(edges.toDF("src", "dst"), nodes.toDF("id"), 3,
        driverEdgeLimit = 0L)
      .as[(Long, Long, Long)].collect().toSet
    assert(driver == dist)
  }
}
