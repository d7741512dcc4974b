package graft

import graft.sim.Knn
import org.apache.spark.sql.Observation

/** SemDeDup (Abbas et al. 2023) — cluster-scoped semantic dedup: within-cell
  * pair semantics, the documented cross-cell recall trade, and cap-drop
  * observability. */
class SemDedupSpec extends SparkSuiteBase {
  import spark.implicits._

  private def df(rows: (Long, Array[Double])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  test("within-cell near-dups drop the larger-VARCHAR-id side; distinct vectors survive") {
    // centroids = 2 smallest ids: e0 and e1
    val d = df(
      0L -> Array(1.0, 0.0, 0.0, 0.0),
      1L -> Array(0.0, 1.0, 0.0, 0.0),
      2L -> Array(0.99, 0.1, 0.0, 0.0),   // cell 0
      3L -> Array(0.991, 0.1, 0.001, 0.0), // cell 0, cos(2,3) ~ 1 -> loser
      4L -> Array(0.7, 0.5, 0.0, 0.0)     // cell 0, far from 2 and 3
    )
    val out = Knn.semDedup(d, "vec_id", "embedding", simThreshold = 0.999,
      nCells = 2, dim = 4, maxCell = 100)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(out == Seq(0L, 1L, 2L, 4L)) // only 3 (the "3" > "2" side) dropped
  }

  test("cross-cell near-dups are NOT caught — the documented recall trade") {
    val d = df(
      0L -> Array(1.0, 0.0, 0.0, 0.0),
      1L -> Array(0.0, 1.0, 0.0, 0.0),
      // a near-identical pair straddling the centroid boundary: each lands
      // in a different cell so the pair is never compared
      5L -> Array(0.710, 0.704, 0.0, 0.0), // cell 0
      6L -> Array(0.704, 0.710, 0.0, 0.0)  // cell 1
    )
    val out = Knn.semDedup(d, "vec_id", "embedding", simThreshold = 0.999,
      nCells = 2, dim = 4, maxCell = 100)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(out == Seq(0L, 1L, 5L, 6L)) // both boundary twins survive
  }

  test("maxCell cap bounds the quadratic step; drops observable") {
    // cell-0 members by VARCHAR id: "0","2","3","4"; cap 2 -> live {0,2}.
    // 2 is an exact copy of 0 so the losers side is NON-empty (an empty
    // downstream exchange would let AQEPropagateEmptyRelation cull the
    // CollectMetrics node and the drop counters with it — the round-3
    // observe() gotcha); the identical pair (3,4) sits past the cap and
    // is never compared, so both survive: the cap trades recall, visibly.
    val d = df(
      0L -> Array(1.0, 0.0, 0.0, 0.0),
      1L -> Array(0.0, 1.0, 0.0, 0.0),
      2L -> Array(1.0, 0.0, 0.0, 0.0),
      3L -> Array(0.9, 0.1, 0.0, 0.0),
      4L -> Array(0.9, 0.1, 0.0, 0.0)
    )
    val obs = Observation("semdedup_drops")
    val out = Knn.semDedup(d, "vec_id", "embedding", simThreshold = 0.999,
      nCells = 2, dim = 4, maxCell = 2, drops = Some(obs))
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(out == Seq(0L, 1L, 3L, 4L)) // 2 lost to 0; 3,4 exempt past cap
    // 2 members dropped past the cap in one overflowing cell
    assert(obs.get.getOrElse("dropped_members", 0L) == 2L)
    assert(obs.get.getOrElse("overflow_cells", 0L) == 1L)
  }

  test("pairCosineRound6 is bit-identical to the Catalyst round(cosineCol) form") {
    // adversarial values: exact half-boundaries at 6 dp, negatives, zero
    // norms (the 1e-12 guard), anti-parallel vectors, tiny magnitudes
    val r = new java.util.SplittableRandom(0xc051eedL)
    val vecs: Seq[Array[Double]] =
      Seq(Array(0.0, 0.0, 0.0, 0.0), Array(1e-9, -1e-9, 1e-9, -1e-9)) ++
        (0 until 200).map(_ => Array.fill(4)(r.nextDouble() * 2 - 1))
    val pairs = (for (a <- vecs; b <- vecs.take(20)) yield (a, b)).toSeq
    val catalystRows = pairs.toDF("a", "b")
      .select(org.apache.spark.sql.functions.round(
        Knn.cosineCol(org.apache.spark.sql.functions.col("a"),
          org.apache.spark.sql.functions.col("b")), 6).as("c"))
      .collect().map(_.getDouble(0))
    val scalaRows = pairs.map { case (a, b) =>
      val na = math.sqrt(a.foldLeft(0.0)((acc, v) => acc + v * v))
      val nb = math.sqrt(b.foldLeft(0.0)((acc, v) => acc + v * v))
      Knn.pairCosineRound6(a, b, na, nb)
    }
    catalystRows.zip(scalaRows).zipWithIndex.foreach { case ((c, s), i) =>
      assert(java.lang.Double.doubleToLongBits(c) ==
        java.lang.Double.doubleToLongBits(s), s"pair $i: catalyst=$c scala=$s")
    }
  }

  test("null / wrong-dim vectors are exempt, not fatal") {
    val d = Seq(
      (0L, Array(1.0, 0.0, 0.0, 0.0)),
      (1L, Array(0.0, 1.0, 0.0, 0.0)),
      (7L, null.asInstanceOf[Array[Double]]),
      (8L, Array(1.0, 0.0)) // wrong dim
    ).toDF("vec_id", "embedding")
    val out = Knn.semDedup(d, "vec_id", "embedding", simThreshold = 0.999,
      nCells = 2, dim = 4, maxCell = 100)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(out == Seq(0L, 1L, 7L, 8L))
  }
}
