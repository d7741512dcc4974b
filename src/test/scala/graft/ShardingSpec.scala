package graft

import graft.text.Sharding

/** Serpentine sharding: hand-dealt rounds, tie order, balance on random
  * weights, partition-count invariance, degenerate shard counts. */
class ShardingSpec extends SparkSuiteBase {
  import spark.implicits._

  private def run(docs: Seq[(String, Long)], nShards: Int, parts: Int = 4) =
    Sharding.assign(docs.toDF("id", "w"), "id", "w", nShards, parts)
      .as[(String, Long, Long)].collect()

  test("hand-dealt serpentine: forward round then reversed round") {
    val docs = Seq("a" -> 10L, "b" -> 9L, "c" -> 8L, "d" -> 7L, "e" -> 6L, "f" -> 5L)
    val got = run(docs, 3).map(r => r._1 -> r._3).toMap
    // ranks: a..f; round 0 forward -> shards 0,1,2; round 1 reversed -> 2,1,0
    assert(got == Map("a" -> 0L, "b" -> 1L, "c" -> 2L,
      "d" -> 2L, "e" -> 1L, "f" -> 0L))
    val totals = run(docs, 3).groupBy(_._3).map { case (s, rs) => (s, rs.map(_._2).sum) }
    assert(totals.values.toSet == Set(15L))
  }

  test("weight ties rank by id — assignment is a total function") {
    val docs = Seq("b" -> 5L, "a" -> 5L, "c" -> 5L, "d" -> 5L)
    val got = run(docs, 2).map(r => r._1 -> r._3).toMap
    // rank order a,b,c,d -> shards 0,1 then reversed 1,0
    assert(got == Map("a" -> 0L, "b" -> 1L, "c" -> 1L, "d" -> 0L))
  }

  test("balance: shard totals differ by at most the largest weight") {
    val rnd = new scala.util.Random(13)
    val docs = (0 until 500).map(i => (f"d$i%04d", 1L + rnd.nextInt(1000).toLong))
    val rows = run(docs, 7)
    val totals = rows.groupBy(_._3).values.map(_.map(_._2).sum)
    assert(totals.max - totals.min <= docs.map(_._2).max)
  }

  test("pure function of (docs, nShards): partition count does not matter") {
    val rnd = new scala.util.Random(5)
    val docs = (0 until 200).map(i => (f"d$i%03d", rnd.nextInt(100).toLong))
    assert(run(docs, 5, parts = 1).toSet == run(docs, 5, parts = 11).toSet)
  }

  test("one shard takes everything; more shards than docs spread singly") {
    val docs = Seq("a" -> 3L, "b" -> 2L)
    assert(run(docs, 1).forall(_._3 == 0L))
    val wide = run(docs, 10).map(_._3).toSet
    assert(wide == Set(0L, 1L))
  }
}
