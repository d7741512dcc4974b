package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jégou, Douze, Schmid, "Product Quantization for
  * Nearest Neighbor Search", IEEE TPAMI 2011 — published method) — the
  * memory-footprint scale path beside the IVF-flat and sign-LSH ANN
  * variants ([[Knn.ivfTopK]], [[Knn.annTopK]]): a dim-64 float vector
  * (256 B) compresses to `m` one-byte codes, so at 10⁹+ vectors the whole
  * encoded corpus is RAM-resident on an executor fleet while raw vectors
  * would be a disk-bound scan. (The reference hides vector storage behind
  * its Chroma collection API, chroma_store.py:33-61; PQ is what a vector
  * store does under that API at scale.)
  *
  *  - TRAIN: split each vector into `m` sub-vectors of dim/m components;
  *    per subspace, Lloyd's k-means ([[Kmeans.trainQuantized]] — the
  *    fixed-point, hash-exact variant) learns a `ks`-entry codebook.
  *  - ENCODE: per row, per subspace, the code is the argmin-distance
  *    codebook entry (exact integer distances, ties → smallest code).
  *  - SEARCH (ADC — asymmetric distance computation): a query builds one
  *    m×ks table of exact integer distances from ITS sub-vectors to every
  *    codebook entry; a candidate's approximate distance is the sum of m
  *    table lookups — no per-candidate vector arithmetic at all.
  *
  * Everything runs on the [[Kmeans.Scale]] fixed-point grid, so training
  * trajectories, codes, and ADC distances are integer-exact: the DuckDB
  * oracle replays the same m unrolled Lloyd runs and the gate hash-checks
  * end-to-end (the PageRank/Kmeans scaled-integer discipline — no float
  * contract anywhere).
  *
  * Scale shape: codebooks are m·ks·(dim/m) longs — driver-collected once
  * (bounded, corpus-size-independent) and broadcast; encoding is ONE
  * narrow pass emitting (id, m codes); ADC scoring is ONE narrow pass over
  * the encoded relation (queries' distance tables ride the same broadcast)
  * followed by a per-query top-k rank window (`row_number ≤ k` →
  * WindowGroupLimit truncates map-side before the exchange). Training cost
  * is m independent Lloyd runs over sliced points; at 100 TB you train the
  * codebooks on a bounded sample (`sampleCap` smallest ids — deterministic)
  * and encode the full corpus, which is the published practice.
  */
object Pq {

  /** Per-subspace codebooks: books(sub)(code) is a (dim/m)-long centroid. */
  type Codebooks = Array[Array[Array[Long]]]

  /** Train m codebooks of ks entries each over the `sampleCap` smallest-id
    * vectors (deterministic sample — the whole corpus at gate scale). */
  def train(df: DataFrame, idCol: String, vecCol: String,
            m: Int, ks: Int, iters: Int, dim: Int,
            sampleCap: Int = Int.MaxValue): Codebooks = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val sub = dim / m
    val pts0 = Kmeans.quantize(df, idCol, vecCol, dim)
    val pts = (if (sampleCap == Int.MaxValue) pts0
               else pts0.orderBy("id").limit(sampleCap)).persist()
    try trainSlices(pts, m, sub, ks, iters)
    finally pts.unpersist()
  }

  /** All m per-slice codebooks in ONE Lloyd loop over the full-width
    * quantized relation: per iteration a single narrow pass assigns every
    * (row, subspace) pair to its argmin entry and accumulates per-
    * (subspace, cluster, component) integer sums map-side, so the whole
    * round is one job instead of m — subspace-for-subspace the identical
    * trajectory to m independent [[Kmeans.trainQuantized]] runs (same
    * smallest-id init slices, same strict-< tie rule via [[argminCode]] —
    * the documented Kmeans assignment convention — same truncating
    * integer centroid division, same empty-cluster keep). PqSpec pins the
    * equality against the per-slice runs. */
  private[sim] def trainSlices(pts: DataFrame, m: Int, sub: Int,
                               ks: Int, iters: Int): Codebooks = {
    val spark = pts.sparkSession
    import spark.implicits._
    // init: the ks smallest-id vectors (ONE collect serves every subspace —
    // the per-slice runs each picked the same ids' slices)
    val init = pts.orderBy("id").limit(ks).collect()
      .map(_.getSeq[Long](1).toArray)
    require(init.length == ks, s"need >= $ks vectors, got ${init.length}")
    var books: Codebooks =
      Array.tabulate(m)(j => init.map(_.slice(j * sub, (j + 1) * sub)))
    for (_ <- 1 to iters) {
      val bc = spark.sparkContext.broadcast(books)
      val partials = pts.select(col("p")).as[Array[Long]]
        .mapPartitions { it =>
          val bks = bc.value
          val sums = Array.fill(m, ks)(null: Array[Long])
          val cnts = Array.ofDim[Long](m, ks)
          it.foreach { p =>
            var j = 0
            while (j < m) {
              val c = argminCode(p, j * sub, bks(j))
              var s = sums(j)(c)
              if (s == null) { s = new Array[Long](sub); sums(j)(c) = s }
              var i = 0
              while (i < sub) { s(i) += p(j * sub + i); i += 1 }
              cnts(j)(c) += 1L
              j += 1
            }
          }
          (for { j <- (0 until m).iterator; c <- (0 until ks).iterator
                 if cnts(j)(c) > 0L }
            yield (j, c, sums(j)(c), cnts(j)(c)))
        }
        .collect() // ≤ partitions·m·ks tiny rows — bounded driver scalar
      // driver merge + divide: integer sums are order-free, so the
      // partition-wise partials fold to the same totals as one global
      // aggregate; empty cluster keeps its previous centroid (the Kmeans
      // contract), division truncates like the trainQuantized driver fold
      val totS = Array.fill(m, ks)(null: Array[Long])
      val totN = Array.ofDim[Long](m, ks)
      partials.foreach { case (j, c, s, n) =>
        var t = totS(j)(c)
        if (t == null) { t = new Array[Long](sub); totS(j)(c) = t }
        var i = 0
        while (i < sub) { t(i) += s(i); i += 1 }
        totN(j)(c) += n
      }
      val next = books.map(_.map(_.clone()))
      for (j <- 0 until m; c <- 0 until ks; if totN(j)(c) > 0L) {
        var i = 0
        while (i < sub) { next(j)(c)(i) = totS(j)(c)(i) / totN(j)(c); i += 1 }
      }
      books = next
      bc.destroy()
    }
    books
  }

  /** (id BIGINT, codes ARRAY<INT>) — one narrow pass; malformed vectors
    * (null / wrong dim) are excluded, as across the ANN family. */
  def encode(df: DataFrame, idCol: String, vecCol: String,
             books: Codebooks, dim: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(books)
    val m = books.length
    val sub = dim / m
    df.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("vec"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val bks = bc.value
        it.flatMap { case (id, vec) =>
          if (vec == null || vec.length != dim) Iterator.empty
          else {
            val q = quantizeVec(vec)
            Iterator.single((id, Array.tabulate(m)(j => argminCode(q, j * sub, bks(j)))))
          }
        }
      }.toDF("id", "codes")
  }

  /** ADC top-k: approximate distance (BIGINT, exact given the codes) from
    * each query in `queries` to every encoded corpus vector, smallest k.
    * Output: (qid, id, adist, rank) — rank by (adist asc, id asc).
    * Query vectors are driver-collected (bounded — the query batch is
    * small by contract, like the IVF centroid collect) so the m×ks
    * distance tables ride one broadcast into a single narrow scan. */
  def adcTopK(encoded: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, books: Codebooks, k: Int, dim: Int): DataFrame = {
    val spark = encoded.sparkSession
    import spark.implicits._
    val m = books.length
    val sub = dim / m
    val qvecs: Array[(Long, Array[Double])] = queries
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .filter(size(col(vecCol)) === dim)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    // per query: dt(j)(c) = exact integer distance from its j-th sub-vector
    // to codebook entry c — computed once on the driver, broadcast
    val tables: Array[(Long, Array[Array[Long]])] = qvecs.map { case (qid, vec) =>
      val q = quantizeVec(vec)
      (qid, Array.tabulate(m) { j =>
        val base = j * sub
        books(j).map(cent => sqDistAt(q, base, cent))
      })
    }
    val bc = spark.sparkContext.broadcast(tables)
    val scored = encoded.select(col("id"), col("codes"))
      .as[(Long, Array[Int])]
      .mapPartitions { it =>
        val ts = bc.value
        it.flatMap { case (id, codes) =>
          ts.iterator.filter(_._1 != id).map { case (qid, dt) =>
            var d = 0L
            var j = 0
            while (j < dt.length) { d += dt(j)(codes(j)); j += 1 }
            (qid, id, d)
          }
        }
      }.toDF("qid", "id", "adist")
    val w = Window.partitionBy("qid").orderBy(asc("adist"), asc("id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Train + encode + search in one call — the q_pq gate shape: queries
    * are the corpus vectors with id < nQueries (the IVF convention). */
  def topK(df: DataFrame, idCol: String, vecCol: String, k: Int,
           m: Int = 4, ks: Int = 8, iters: Int = 2, dim: Int = 64,
           nQueries: Int = 8): DataFrame = {
    val books = train(df, idCol, vecCol, m, ks, iters, dim)
    val enc = encode(df, idCol, vecCol, books, dim)
    val queries = df.filter(col(idCol).cast("long") < nQueries)
    adcTopK(enc, queries, idCol, vecCol, books, k, dim)
  }

  /** The [[Kmeans.quantize]] formula, row-local: floor(x·Scale) + Scale.
    * MUST match the Catalyst/DuckDB expression bit-for-bit (float→double
    * widening is exact; floor of a double is engine-independent). */
  private[sim] def quantizeVec(vec: Array[Double]): Array[Long] = {
    val out = new Array[Long](vec.length)
    var i = 0
    while (i < vec.length) {
      out(i) = math.floor(vec(i) * Kmeans.Scale).toLong + Kmeans.Scale
      i += 1
    }
    out
  }

  /** Exact integer squared distance from q[base .. base+len) to `cent`. */
  private[sim] def sqDistAt(q: Array[Long], base: Int, cent: Array[Long]): Long = {
    var d = 0L
    var i = 0
    while (i < cent.length) {
      val x = q(base + i) - cent(i)
      d += x * x
      i += 1
    }
    d
  }

  /** Argmin codebook entry for the sub-vector at `base`; strict `<` keeps
    * the smallest code on ties (the Kmeans assignment convention). */
  private[sim] def argminCode(q: Array[Long], base: Int, book: Array[Array[Long]]): Int = {
    var best = 0
    var bestD = Long.MaxValue
    var c = 0
    while (c < book.length) {
      val d = sqDistAt(q, base, book(c))
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }
}
