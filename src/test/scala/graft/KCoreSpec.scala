package graft

import graft.graph.KCore

/** k-core peel: hand-computed cores, cascading multi-round peel,
  * simple-graph normalization, partition invariance. */
class KCoreSpec extends SparkSuiteBase {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], k: Int, parts: Int = 4) =
    KCore.run(edges.toDF("src", "dst").repartition(parts), k)
      .as[(Long, Long)].collect().toMap

  test("triangle with a pendant: 2-core keeps the triangle, sheds the tail") {
    val edges = Seq(1L -> 2L, 2L -> 3L, 1L -> 3L, 3L -> 4L)
    assert(run(edges, 2) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("path graph cascades to empty under k=2 (multi-round peel)") {
    val path = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L)
    assert(run(path, 2).isEmpty)
  }

  test("self-loops and parallel/reciprocal edges collapse before peeling") {
    // simple graph = triangle {1,2,3}: the self-loop and the duplicate
    // 1-2 edges must not inflate any degree
    val edges = Seq(1L -> 2L, 2L -> 1L, 1L -> 1L, 2L -> 3L, 3L -> 1L)
    assert(run(edges, 2) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    assert(run(edges, 3).isEmpty)
  }

  test("k=1 keeps every non-isolated vertex with its simple degree") {
    val edges = Seq(1L -> 2L, 2L -> 3L)
    assert(run(edges, 1) == Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
  }

  test("pure function of (edges, k): partitioning does not matter") {
    val edges = Seq(1L -> 2L, 2L -> 3L, 1L -> 3L, 3L -> 4L, 4L -> 5L,
      5L -> 3L, 5L -> 1L)
    assert(run(edges, 3, parts = 1) == run(edges, 3, parts = 7))
  }

  test("driver fast-path equals the forced distributed peel") {
    val edges = Seq(1L -> 2L, 2L -> 3L, 1L -> 3L, 3L -> 4L, 4L -> 5L,
      5L -> 3L, 2L -> 2L, 3L -> 1L)
    val driver = run(edges, 2)
    val dist = KCore.run(edges.toDF("src", "dst"), 2, driverEdgeLimit = 0L)
      .as[(Long, Long)].collect().toMap
    assert(driver == dist)
  }
}
