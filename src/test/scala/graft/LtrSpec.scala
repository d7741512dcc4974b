package graft

import graft.index.{Bm25, Ltr, QueryLikelihood}
import org.apache.spark.sql.functions._

class LtrSpec extends SparkSuiteBase {
  import spark.implicits._

  private val docs = Seq(
    ("d1", "spark filter join spark filter table extra words here"),
    ("d2", "spark appears alone far from filter which is way over there"),
    ("d3", "join table join table join"),
    ("d4", "nothing relevant at all in this one")
  ).toDF("id", "text")
  private val q = "spark filter join table"

  test("each feature column equals its standalone operator") {
    val f = Ltr.features(docs, "id", "text", q, w = 6)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    val bm = Bm25.scores(docs, "id", "text", q).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val ql = QueryLikelihood.scores(docs, "id", "text", q).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val prox = Bm25.proximityWindows(docs, "id", "text", q, 6).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(f.keySet == Set("d1", "d2", "d3")) // d4 matches nothing
    for ((d, (fb, _, fq, fp, fdl, fm)) <- f) {
      assert(fb == bm(d), s"$d bm25")
      assert(fq == ql(d), s"$d ql")
      assert(fp == prox.getOrElse(d, 0L), s"$d prox")
      assert(fdl > 0 && fm >= 1)
    }
    // d1 packs all four terms into width-6 windows; d2 never clusters
    assert(f("d1")._4 >= 1 && f("d2")._4 == 0L)
    assert(f("d1")._6 == 4L && f("d2")._6 == 2L && f("d3")._6 == 2L)
  }

  test("partition invariance") {
    val a = Ltr.features(docs, "id", "text", q).orderBy("doc").collect().toSeq
    val b = Ltr.features(docs.repartition(5, col("id")), "id", "text", q)
      .orderBy("doc").collect().toSeq
    assert(a == b)
  }
}
