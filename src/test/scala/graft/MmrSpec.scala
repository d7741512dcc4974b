package graft

import org.apache.spark.sql.functions._
import graft.sim.Mmr

class MmrSpec extends SparkSuiteBase {
  import spark.implicits._

  // orthonormal-ish toy vectors: two near-duplicates with top relevance, one
  // orthogonal with lower relevance — MMR must demote the duplicate
  private val cands = Seq(
    (1L, 0.99, Array(1.0, 0.0, 0.0)),   // best rel
    (2L, 0.98, Array(1.0, 0.001, 0.0)), // near-copy of 1 → redundant
    (3L, 0.60, Array(0.0, 1.0, 0.0)),   // orthogonal
    (4L, 0.50, Array(0.0, 0.0, 1.0))
  ).toDF("id", "rel", "vec")

  test("greedy MMR demotes redundant near-duplicates") {
    val out = Mmr.rerank(spark, cands, "id", "rel", "vec", k = 3, lambda = 0.7)
      .orderBy("rnk").collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    // round1: id 1 (pure rel). round2: id2 score = .7*.98-.3*cos(2,1)≈.686-.3
    // while id3 = .7*.60-.3*0 = .42 → id3 wins. round3: id2 (.386) vs id4
    // (.35) → id2.
    assert(out == Seq((1, 1L), (2, 3L), (3, 2L)))
  }

  test("k larger than candidate count returns all, in greedy order") {
    val out = Mmr.rerank(spark, cands, "id", "rel", "vec", k = 10, lambda = 0.7)
    assert(out.count() == 4)
    assert(out.agg(max("rnk")).head().getInt(0) == 4)
  }

  test("lambda=1 is pure relevance order with id-asc ties") {
    val tied = Seq((5L, 0.9, Array(1.0, 0.0)), (2L, 0.9, Array(0.0, 1.0)),
      (7L, 0.8, Array(1.0, 1.0))).toDF("id", "rel", "vec")
    val out = Mmr.rerank(spark, tied, "id", "rel", "vec", k = 3, lambda = 1.0)
      .orderBy("rnk").collect().map(_.getLong(1)).toSeq
    assert(out == Seq(2L, 5L, 7L))
  }

  test("maxCandidates bounds the collected set") {
    val out = Mmr.rerank(spark, cands, "id", "rel", "vec", k = 10, lambda = 0.7,
      maxCandidates = 2)
    // only ids 1,2 (top-2 by rel) are ever considered
    assert(out.select("id").as[Long].collect().toSet == Set(1L, 2L))
  }
}
