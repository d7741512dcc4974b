package graft

import graft.sim.Kmeans

/** Fixed-point Lloyd's k-means: the whole trajectory is integer-exact, so
  * the operator must reproduce a straight single-threaded reference
  * implementation bit-for-bit — at any partitioning (order-free integer
  * sums), with ties to the smallest centroid index, and with empty
  * clusters keeping their previous centroid. */
class KmeansSpec extends SparkSuiteBase {
  import spark.implicits._

  private val Dim = 16

  private def vec(seed: Long): Array[Double] = {
    val r = new java.util.SplittableRandom(seed)
    Array.fill(Dim)(r.nextDouble() - 0.5)
  }

  /** Single-threaded reference of the same algorithm. */
  private def reference(data: Seq[(Long, Array[Double])], k: Int,
                        iters: Int): Map[Long, (Int, Long)] = {
    val pts = data.sortBy(_._1).map { case (id, v) =>
      id -> v.map(x => math.floor(x * Kmeans.Scale).toLong + Kmeans.Scale)
    }
    def d2(p: Array[Long], q: Array[Long]): Long =
      p.indices.map(i => (p(i) - q(i)) * (p(i) - q(i))).sum
    var cents = pts.take(k).map(_._2.clone()).toArray
    for (_ <- 1 to iters) {
      val assign = pts.map { case (id, p) =>
        (id, p, (0 until k).minBy(j => (d2(p, cents(j)), j)))
      }
      cents = (0 until k).map { j =>
        val members = assign.filter(_._3 == j).map(_._2)
        if (members.isEmpty) cents(j)
        else Array.tabulate(Dim)(i => members.map(_(i)).sum / members.size)
      }.toArray
    }
    pts.map { case (id, p) =>
      val j = (0 until k).minBy(j => (d2(p, cents(j)), j))
      id -> (j, d2(p, cents(j)))
    }.toMap
  }

  private def run(data: Seq[(Long, Array[Double])], k: Int, iters: Int,
                  parts: Int): Map[Long, (Int, Long)] =
    Kmeans.lloyd(data.toDF("id", "vec").repartition(parts), "id", "vec",
        k = k, iters = iters, dim = Dim)
      .as[(Long, Int, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap

  test("matches the single-threaded reference at two partitionings") {
    val data = (0 until 60).map(i => (i.toLong, vec(4000L + i)))
    val exp = reference(data, k = 4, iters = 3)
    assert(run(data, 4, 3, parts = 1) == exp)
    assert(run(data, 4, 3, parts = 7) == exp)
  }

  test("identical init centroids: ties go to the smaller index and starved clusters keep their centroids") {
    // id 0 is far away; ids 1..39 all share one vector. Init centroids
    // c1 == c2 == c3, so every shared point ties and resolves to c1 in
    // EVERY iteration (c1's mean of identical members never moves);
    // c2/c3 never receive a member and must keep their centroids.
    val dup = vec(9001L)
    val data = Seq((0L, vec(9000L).map(_ + 50.0))) ++
      (1 until 40).map(i => (i.toLong, dup))
    val got = run(data, 4, 3, parts = 3)
    assert(!got.values.exists(g => g._1 == 2 || g._1 == 3),
      "clusters 2 and 3 must stay empty")
    assert(got(0L)._1 == 0 && got(1L) == ((1, 0L)))
    assert(got == reference(data, k = 4, iters = 3))
  }

  test("size-gated driver loop == distributed loop (centroids and assignments bit-equal)") {
    val data = (0 until 60).map(i => (i.toLong, vec(4000L + i)))
    val q = Kmeans.quantize(data.toDF("id", "vec").repartition(5), "id", "vec", Dim)
    val (cd, ad) = Kmeans.trainQuantized(q, 4, 3) // 60 rows: gate fires
    val (cx, ax) = Kmeans.trainQuantized(q, 4, 3, driverPointLimit = 0L) // forced distributed
    assert(cd.map(_.toSeq).toSeq == cx.map(_.toSeq).toSeq)
    assert(ad.as[(Long, Int, Long)].collect().sortBy(_._1).toSeq ==
      ax.as[(Long, Int, Long)].collect().sortBy(_._1).toSeq)
  }

  test("well-separated blobs recover their generating partition") {
    // 3 tight blobs offset by large constants; k=3, ids interleaved so the
    // init centroids (ids 0,1,2) land one per blob.
    val data = (0 until 45).map { i =>
      val blob = i % 3
      val base = vec(7000L + i).map(_ * 0.01)
      (i.toLong, base.zipWithIndex.map { case (x, d) =>
        x + (if (d == blob) 10.0 else 0.0)
      })
    }
    val got = run(data, 3, 2, parts = 4)
    data.foreach { case (id, _) => assert(got(id)._1 == (id % 3).toInt) }
  }
}
