package graft

import graft.sim.Knn

/** IVF-flat ANN: with exhaustive probing (nProbe == nCells) the operator
  * must return EXACTLY the brute-force top-k per query — the coarse
  * quantizer only prunes, never re-scores. With narrow probing results are
  * a subset of brute-force candidates ranked identically. */
class IvfSpec extends SparkSuiteBase {
  import spark.implicits._

  private def vec(seed: Long): Array[Double] = {
    val r = new java.util.SplittableRandom(seed)
    Array.fill(64)(r.nextDouble() - 0.5)
  }

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < 64) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / math.max(math.sqrt(na) * math.sqrt(nb), 1e-12)
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("nProbe == nCells: IVF equals brute-force top-k per query") {
    val n = 60
    val data = (0 until n).map(i => (i.toLong, vec(1000L + i)))
    val df = data.toDF("id", "vec")
    val queries = df.filter($"id" < 5)
    val got = Knn.ivfTopK(df, queries, "id", "vec", k = 5, nCells = 8, nProbe = 8)
      .select("qid", "id", "cosine", "rank")
      .as[(String, String, Double, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4).map(t => (t._2, t._3)).toSeq).toMap

    val byId = data.toMap
    (0 until 5).foreach { q =>
      val qv = byId(q.toLong)
      val expected = data.filter(_._1 != q.toLong)
        .map { case (id, v) => (id.toString, round6(cosine(qv, v))) }
        .sortBy { case (id, c) => (-c, id) } // same tie-break as the window
        .take(5)
      assert(got(q.toString) == expected, s"query $q")
    }
  }

  test("narrow probing returns a correctly-ranked subset of the probed cells") {
    val n = 80
    val data = (0 until n).map(i => (i.toLong, vec(2000L + i)))
    val df = data.toDF("id", "vec")
    val queries = df.filter($"id" < 3)
    val rows = Knn.ivfTopK(df, queries, "id", "vec", k = 5, nCells = 8, nProbe = 2)
      .select("qid", "id", "cosine", "rank")
      .as[(String, String, Double, Int)].collect()
    assert(rows.nonEmpty)
    // per query: ranks contiguous from 1, cosines non-increasing, no self
    rows.groupBy(_._1).foreach { case (qid, rs) =>
      val sorted = rs.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to sorted.length))
      assert(sorted.sliding(2).forall(p => p.length < 2 || p(0)._3 >= p(1)._3))
      assert(!rs.exists(_._2 == qid))
    }
  }
}
