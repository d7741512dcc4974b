package graft

import org.apache.spark.sql.functions._
import graft.index.Hybrid

class HybridSpec extends SparkSuiteBase {
  import spark.implicits._

  // hand-computable legs: scores pick explicit ranks
  private def legs() = {
    val lex = Seq((1L, 9.0), (2L, 7.0), (3L, 5.0), (4L, 3.0)).toDF("doc", "score")
    val vec = Seq((3L, 0.99), (5L, 0.88), (1L, 0.77)).toDF("doc", "score")
    Seq(Hybrid.Leg("lex", lex, "doc", "score"), Hybrid.Leg("vec", vec, "doc", "score"))
  }

  test("rrf fuses ranks with k0=60, null rank for absent legs") {
    val out = Hybrid.rrf(legs(), n = 3).orderBy("doc").collect()
    // lex top-3: 1,2,3 (ranks 1,2,3); vec top-3: 3,5,1 (ranks 1,2,3); doc 4 capped out
    val byDoc = out.map(r => r.getLong(0) -> r).toMap
    assert(byDoc.keySet == Set(1L, 2L, 3L, 5L))
    assert(byDoc(1L).getInt(1) == 1 && byDoc(1L).getInt(2) == 3)
    assert(byDoc(2L).getInt(1) == 2 && byDoc(2L).isNullAt(2))
    assert(byDoc(3L).getInt(1) == 3 && byDoc(3L).getInt(2) == 1)
    assert(byDoc(5L).isNullAt(1) && byDoc(5L).getInt(2) == 2)
    def rrf(rs: Int*) = math.rint(rs.map(r => 1.0 / (60 + r)).sum * 1e6) / 1e6
    assert(byDoc(1L).getDouble(3) == rrf(1, 3))
    assert(byDoc(2L).getDouble(3) == rrf(2))
    assert(byDoc(3L).getDouble(3) == rrf(3, 1))
    // fused order: doc3 (1/63+1/61) > doc1 (1/61+1/63)? equal! both {1,3}
    assert(byDoc(1L).getDouble(3) == byDoc(3L).getDouble(3))
  }

  test("rrf ties in a leg break by doc asc; cap is per leg") {
    val lex = Seq((7L, 1.0), (6L, 1.0), (5L, 1.0)).toDF("doc", "score")
    val out = Hybrid.rrf(Seq(Hybrid.Leg("lex", lex, "doc", "score")), n = 2)
      .orderBy("doc").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(5L, 6L))
    assert(out.map(_.getInt(1)).toSeq == Seq(1, 2))
  }

  test("rrfPerQuery keys every window by qid") {
    val lex = Seq(("a", 1L, 9.0), ("a", 2L, 8.0), ("b", 2L, 9.0), ("b", 1L, 8.0))
      .toDF("qid", "doc", "score")
    val vec = Seq(("a", 2L, 0.9), ("b", 1L, 0.9)).toDF("qid", "doc", "score")
    val out = Hybrid.rrfPerQuery(
        Seq(Hybrid.Leg("lex", lex, "doc", "score"), Hybrid.Leg("vec", vec, "doc", "score")),
        "qid", n = 2)
      .orderBy("qid", "doc").collect()
    val rows = out.map(r => (r.getString(0), r.getLong(1),
      if (r.isNullAt(2)) -1 else r.getInt(2), if (r.isNullAt(3)) -1 else r.getInt(3)))
    assert(rows.toSeq == Seq(
      ("a", 1L, 1, -1), ("a", 2L, 2, 1), ("b", 1L, 2, 1), ("b", 2L, 1, -1)))
  }

  test("three-leg fusion sums in declaration order (deterministic double)") {
    val l1 = Seq((1L, 1.0)).toDF("doc", "score")
    val l2 = Seq((1L, 1.0)).toDF("doc", "score")
    val l3 = Seq((1L, 1.0)).toDF("doc", "score")
    val out = Hybrid.rrf(Seq(
      Hybrid.Leg("a", l1, "doc", "score"), Hybrid.Leg("b", l2, "doc", "score"),
      Hybrid.Leg("c", l3, "doc", "score")), n = 1).collect()
    val expect = math.rint((((0.0 + 1.0 / 61) + 1.0 / 61) + 1.0 / 61) * 1e6) / 1e6
    assert(out.length == 1 && out(0).getDouble(out(0).length - 1) == expect)
  }
}
