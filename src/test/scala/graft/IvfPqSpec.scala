package graft

import graft.sim.{IvfPq, Kmeans}

/** IVF-PQ: the composed coarse-quantizer + residual-PQ index must
  * reproduce a straight single-threaded reference of the same fixed-point
  * algorithm bit-for-bit — at any partitioning, with every tie convention
  * (coarse assignment, probe order, codes, final rank) pinned. */
class IvfPqSpec extends SparkSuiteBase {
  import spark.implicits._

  private val Dim = 8
  private val M = 2
  private val Sub = Dim / M

  private def vec(seed: Long): Array[Double] = {
    val r = new java.util.SplittableRandom(seed)
    Array.fill(Dim)(r.nextDouble() - 0.5)
  }

  private def quant(v: Array[Double]): Array[Long] =
    v.map(x => math.floor(x * Kmeans.Scale).toLong + Kmeans.Scale)

  private def d2(p: Array[Long], q: Array[Long]): Long =
    p.indices.map(i => (p(i) - q(i)) * (p(i) - q(i))).sum

  /** The shared Lloyd reference (KmeansSpec conventions: init = k
    * smallest-id vectors, tie → smallest index, empty keeps centroid). */
  private def lloyd(pts: Seq[(Long, Array[Long])], k: Int, iters: Int): Array[Array[Long]] = {
    val sorted = pts.sortBy(_._1)
    var cents = sorted.take(k).map(_._2.clone()).toArray
    for (_ <- 1 to iters) {
      val assign = sorted.map { case (_, p) => (p, (0 until k).minBy(c => (d2(p, cents(c)), c))) }
      cents = (0 until k).map { c =>
        val members = assign.filter(_._2 == c).map(_._1)
        if (members.isEmpty) cents(c)
        else Array.tabulate(cents(c).length)(i => members.map(_(i)).sum / members.size)
      }.toArray
    }
    cents
  }

  /** Single-threaded IVF-PQ reference: coarse cells, residual codebooks,
    * per-(query, probed-cell) ADC tables, candidates from probed cells. */
  private def reference(data: Seq[(Long, Array[Double])], nCells: Int, citers: Int,
                        nProbe: Int, ks: Int, iters: Int, nQueries: Int,
                        k: Int): Seq[(Long, Long, Long, Int)] = {
    val pts = data.sortBy(_._1).map { case (id, v) => id -> quant(v) }
    val cents = lloyd(pts, nCells, citers)
    val cellOf = pts.map { case (id, p) =>
      id -> (0 until nCells).minBy(c => (d2(p, cents(c)), c))
    }.toMap
    val res = pts.map { case (id, p) =>
      val c = cents(cellOf(id))
      id -> Array.tabulate(Dim)(i => p(i) - c(i) + IvfPq.ResOff)
    }
    val books = (0 until M).map { j =>
      lloyd(res.map { case (id, r) => id -> r.slice(j * Sub, (j + 1) * Sub) }, ks, iters)
    }.toArray
    val codes = res.map { case (id, r) =>
      id -> Array.tabulate(M) { j =>
        val s = r.slice(j * Sub, (j + 1) * Sub)
        (0 until ks).minBy(c => (d2(s, books(j)(c)), c))
      }
    }.toMap
    pts.filter(_._1 < nQueries).flatMap { case (qid, qp) =>
      val probed = (0 until nCells).map(c => (d2(qp, cents(c)), c)).sorted.take(nProbe).map(_._2)
      val cand = probed.flatMap { ci =>
        val qr = Array.tabulate(Dim)(i => qp(i) - cents(ci)(i) + IvfPq.ResOff)
        val dt = Array.tabulate(M, ks)((j, c) => d2(qr.slice(j * Sub, (j + 1) * Sub), books(j)(c)))
        pts.collect { case (id, _) if id != qid && cellOf(id) == ci =>
          (id, (0 until M).map(j => dt(j)(codes(id)(j))).sum)
        }
      }
      cand.sortBy { case (id, d) => (d, id) }.take(k).zipWithIndex
        .map { case ((id, d), i) => (qid, id, d, i + 1) }
    }
  }

  private val data: Seq[(Long, Array[Double])] =
    (0L until 80L).map(i => i -> vec(i * 6151 + 11))

  private def run(df: org.apache.spark.sql.DataFrame) =
    IvfPq.topK(df, "vec_id", "embedding", k = 5,
        nCells = 4, citers = 2, nProbe = 2, m = M, ks = 4, iters = 2,
        dim = Dim, nQueries = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4)).toSeq

  private val want =
    reference(data, nCells = 4, citers = 2, nProbe = 2, ks = 4, iters = 2,
      nQueries = 3, k = 5).sortBy(t => (t._1, t._4))

  test("topK matches the single-threaded reference exactly") {
    assert(run(data.toDF("vec_id", "embedding")) == want)
  }

  test("partition-count invariant") {
    assert(run(data.toDF("vec_id", "embedding").repartition(7)) == want)
  }

  test("candidates come only from probed cells and exclude self") {
    val got = run(data.toDF("vec_id", "embedding"))
    assert(got.nonEmpty && got.forall { case (qid, id, _, _) => qid != id })
    // every (qid, rank) unique and ranks contiguous from 1
    got.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._4).sorted == (1 to rows.length))
    }
  }
}
