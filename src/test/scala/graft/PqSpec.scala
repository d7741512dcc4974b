package graft

import graft.sim.{Kmeans, Pq}

/** Product quantization: train/encode/ADC must reproduce a straight
  * single-threaded reference of the same fixed-point algorithm bit-for-bit
  * — at any partitioning, with argmin ties to the smallest code, and with
  * the ADC distance an exact integer sum of per-subspace table lookups. */
class PqSpec extends SparkSuiteBase {
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

  /** Single-threaded PQ reference: per-subspace Lloyd (same init/tie/empty
    * conventions as KmeansSpec's reference), argmin codes, ADC top-k. */
  private def reference(data: Seq[(Long, Array[Double])], ks: Int, iters: Int,
                        nQueries: Int, k: Int): Seq[(Long, Long, Long, Int)] = {
    val pts = data.sortBy(_._1).map { case (id, v) => id -> quant(v) }
    val books = (0 until M).map { j =>
      val sliced = pts.map { case (id, p) => id -> p.slice(j * Sub, (j + 1) * Sub) }
      var cents = sliced.take(ks).map(_._2.clone()).toArray
      for (_ <- 1 to iters) {
        val assign = sliced.map { case (_, p) =>
          (p, (0 until ks).minBy(c => (d2(p, cents(c)), c)))
        }
        cents = (0 until ks).map { c =>
          val members = assign.filter(_._2 == c).map(_._1)
          if (members.isEmpty) cents(c)
          else Array.tabulate(Sub)(i => members.map(_(i)).sum / members.size)
        }.toArray
      }
      cents
    }.toArray
    val codes = pts.map { case (id, p) =>
      id -> Array.tabulate(M) { j =>
        val s = p.slice(j * Sub, (j + 1) * Sub)
        (0 until books(j).length).minBy(c => (d2(s, books(j)(c)), c))
      }
    }
    val queries = pts.filter(_._1 < nQueries)
    queries.flatMap { case (qid, qp) =>
      val dt = Array.tabulate(M, books(0).length) { (j, c) =>
        d2(qp.slice(j * Sub, (j + 1) * Sub), books(j)(c))
      }
      codes.filter(_._1 != qid)
        .map { case (id, cs) => (id, (0 until M).map(j => dt(j)(cs(j))).sum) }
        .sortBy { case (id, d) => (d, id) }
        .take(k).zipWithIndex
        .map { case ((id, d), i) => (qid, id, d, i + 1) }
    }
  }

  private val data: Seq[(Long, Array[Double])] =
    (0L until 60L).map(i => i -> vec(i * 7919 + 3))

  test("topK matches the single-threaded reference exactly") {
    val df = data.toDF("vec_id", "embedding")
    val got = Pq.topK(df, "vec_id", "embedding", k = 5,
        m = M, ks = 4, iters = 2, dim = Dim, nQueries = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))
    val want = reference(data, ks = 4, iters = 2, nQueries = 3, k = 5)
      .sortBy(t => (t._1, t._4))
    assert(got.toSeq == want)
  }

  test("result is partition-count invariant") {
    val a = Pq.topK(data.toDF("vec_id", "embedding").repartition(1),
        "vec_id", "embedding", k = 4, m = M, ks = 4, iters = 1, dim = Dim, nQueries = 2)
      .collect().map(_.toSeq).toSet
    val b = Pq.topK(data.toDF("vec_id", "embedding").repartition(13),
        "vec_id", "embedding", k = 4, m = M, ks = 4, iters = 1, dim = Dim, nQueries = 2)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("identical vectors encode to identical codes; malformed rows drop") {
    val dup = Seq(10L -> vec(1), 11L -> vec(1), 12L -> vec(2),
      13L -> Array.empty[Double]) // wrong dim — must be excluded
    val df = dup.toDF("vec_id", "embedding")
    val books = Pq.train(df, "vec_id", "embedding", m = M, ks = 2, iters = 1, dim = Dim)
    val enc = Pq.encode(df, "vec_id", "embedding", books, Dim).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    assert(enc.keySet == Set(10L, 11L, 12L))
    assert(enc(10L) == enc(11L))
  }

  test("ADC distance of a vector sitting ON its codebook entries is the table minimum") {
    // with ks == n distinct vectors and iters covering convergence, every
    // vector is its own centroid: its ADC self-distance to any query equals
    // the exact quantized distance (code lookup is exact per subspace)
    val tiny = (0L until 4L).map(i => i -> vec(100 + i))
    val df = tiny.toDF("vec_id", "embedding")
    val books = Pq.train(df, "vec_id", "embedding", m = M, ks = 4, iters = 3, dim = Dim)
    val enc = Pq.encode(df, "vec_id", "embedding", books, Dim)
    val out = Pq.adcTopK(enc, df.filter($"vec_id" === 0L), "vec_id", "embedding",
        books, k = 3, dim = Dim)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val q = quant(tiny(0)._2)
    tiny.drop(1).foreach { case (id, v) =>
      val p = quant(v)
      // exact distance decomposes over subspaces; each code is the vector
      // itself here, so ADC == exact
      assert(out(id) == d2(p, q), s"id $id")
    }
  }
}
