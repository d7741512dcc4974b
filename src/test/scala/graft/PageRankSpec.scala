package graft

import org.apache.spark.sql.functions._
import graft.graph.PageRank

/** Integer-exact crawl-graph centrality (driver gate: q_pagerank). */
class PageRankSpec extends SparkSuiteBase {
  import spark.implicits._

  // 0→{1,2}, 1→2, 2→0; node 3 is isolated (teleport-only)
  private val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 0L)).toDF("src", "dst")
  private val nodes = Seq(0L, 1L, 2L, 3L).toDF("id")

  private def ranks(iters: Int, e: org.apache.spark.sql.DataFrame = edges) =
    PageRank.run(e, nodes, iters, base = 1000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("pagerank: zero iterations returns the base mass") {
    assert(ranks(0) == Map(0L -> 1000L, 1L -> 1000L, 2L -> 1000L, 3L -> 1000L))
  }

  test("pagerank: two hand-computed integer iterations") {
    // teleport = 1000/20*3 = 150; share = floor(rank*17/(20*outdeg))
    // iter1: 0 sends 425 to 1,2; 1 sends 850 to 2; 2 sends 850 to 0
    assert(ranks(1) == Map(0L -> 1000L, 1L -> 575L, 2L -> 1425L, 3L -> 150L))
    // iter2: 0(1000)→425,425; 1(575)→488; 2(1425)→1211
    assert(ranks(2) == Map(0L -> 1361L, 1L -> 575L, 2L -> 1063L, 3L -> 150L))
  }

  test("pagerank: result is partitioning-invariant (integer sums)") {
    val shuffled = edges.repartition(7, col("dst"))
    assert(ranks(3) == ranks(3, shuffled))
  }

  test("pagerank: driver fast-path equals the distributed loop, multi-edges included") {
    // multi-edge graph (duplicate (0,2) rows => weight 2) + an edge whose
    // src is outside the node set (must contribute nothing on both paths)
    val e = Seq((0L, 1L), (0L, 2L), (0L, 2L), (1L, 2L), (2L, 0L), (9L, 0L))
      .toDF("src", "dst")
    val driver = PageRank.run(e, nodes, iters = 4, base = 1000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = PageRank.run(e, nodes, iters = 4, base = 1000000L,
        driverEdgeLimit = 0L) // gate at 0 forces the distributed loop
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(driver == dist)
    assert(driver.keySet == Set(0L, 1L, 2L, 3L)) // 9 gets no teleport row
  }

  test("pagerank: dangling mass dissipates, teleport floor holds") {
    // sink graph: 0→1, 1 has no out-edges — after enough iterations
    // node 1 holds teleport + inflow, node 0 exactly teleport + nothing
    val sink = Seq((0L, 1L)).toDF("src", "dst")
    val two = Seq(0L, 1L).toDF("id")
    val r = PageRank.run(sink, two, iters = 5, base = 1000L)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(0L) == 150L)                 // only teleport ever arrives
    assert(r(1L) == 150L + 150L * 17L / 20L) // teleport + floor(150·0.85/1)
  }
}
