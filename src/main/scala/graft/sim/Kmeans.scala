package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-point Lloyd's k-means over embedding columns — the TRAINED
  * coarse quantizer the IVF family ([[Knn.ivfTopK]], `AnnIndexJob`) can
  * sit on top of (the reference delegates clustering to its vector store,
  * chroma_store.py:33-61; Lloyd 1982 / the k-means|| lineage is the
  * published algorithm).
  *
  * Why fixed-point: float k-means is not reproducible across engines or
  * even across partitionings — summing doubles in a different order
  * moves the centroid, and one moved centroid flips an argmin assignment,
  * which cascades through every later iteration (the boundary-risk
  * failure mode CLAUDE.md documents for DSIR, amplified by iteration).
  * Quantizing ONCE at input onto a 2^15 grid makes every downstream
  * number an integer: distances are exact BIGINTs (|diff| ≤ 2^17,
  * squared ≤ 2^34, ×64 dims ≤ 2^40), centroid updates are integer
  * divisions of non-negative sums (trunc == floor, order-free), and the
  * whole T-iteration trajectory is hash-exact in any engine — the same
  * scaled-integer discipline as [[graft.graph.PageRank]].
  *
  *   q_i = floor(x_i · 32768) + 32768   (offset ⇒ non-negative; constant
  *                                       offsets cancel in distances)
  *
  * Determinism contract: init centroids are the k smallest-id vectors
  * (the sampled-centroid convention [[Knn.ivfTopK]] already pins);
  * assignment ties break to the smallest centroid index; a cluster that
  * loses all members keeps its previous centroid.
  *
  * Scale shape: the quantized corpus is scanned once per iteration with a
  * NARROW per-row argmin over k broadcast centroid literals (no UDF —
  * `zip_with`/`aggregate` stay inside whole-stage codegen); the update is
  * one posexplode + hash aggregate on (cluster, pos) with map-side
  * partials (k·dim grouped rows), collected to the driver as k·dim longs
  * — the bounded-scalar collect pattern, independent of corpus size. No
  * iteration-growing lineage: every pass re-derives from the cached
  * quantized leaf.
  */
object Kmeans {

  val Scale = 32768L // 2^15 fixed-point grid

  /** (id BIGINT, p ARRAY<BIGINT>) — the quantized, offset, dim-filtered
    * input every iteration re-scans. */
  def quantize(df: DataFrame, idCol: String, vecCol: String, dim: Int): DataFrame =
    df.filter(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .select(col(idCol).cast("long").as("id"),
        transform(col(vecCol),
          x => floor(x.cast("double") * Scale).cast("long") + Scale).as("p"))

  /** Exact integer squared distance from row vector `p` to centroid `c`. */
  private def sqDist(p: Column, c: Seq[Long]): Column =
    aggregate(zip_with(p, typedlit(c), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)

  /** (cluster INT, dist BIGINT) appended: argmin over the k centroids,
    * ties to the smallest index. */
  private[sim] def assign(pts: DataFrame, cents: Array[Array[Long]]): DataFrame = {
    val dists = array(cents.map(c => sqDist(col("p"), c.toSeq)).toIndexedSeq: _*)
    pts.withColumn("_d", dists)
      .withColumn("dist", array_min(col("_d")))
      .withColumn("cluster", (array_position(col("_d"), col("dist")) - 1).cast("int"))
      .drop("_d")
  }

  /** T Lloyd iterations; returns the final centroids and the assignment
    * relation (id, cluster, dist) under them. */
  def train(df: DataFrame, idCol: String, vecCol: String,
            k: Int, iters: Int, dim: Int): (Array[Array[Long]], DataFrame) =
    trainQuantized(quantize(df, idCol, vecCol, dim), k, iters)

  /** The Lloyd loop over an ALREADY-quantized `(id BIGINT, p ARRAY<BIGINT>)`
    * relation — the entry [[Pq]] uses to train one codebook per sub-vector
    * slice without re-quantizing. Semantics identical to [[train]].
    *
    * SIZE-GATED driver loop (the PageRank/HyperBall precedent): the
    * distributed loop costs 1 + `iters` scheduled collect jobs, each
    * re-scanning the corpus — pure fixed overhead once the point set is
    * small. At or under `driverPointLimit` rows (default 2^16 ·
    * dim-64 longs ≈ 33 MB — far from driver-heap pressure) the points
    * collect ONCE and the identical integer recurrence runs in arrays:
    * integer sums are order-free, the argmin tie rule (first minimal
    * index) matches `array_position`'s first-occurrence semantics, and
    * the truncating division of non-negative sums is the same — so both
    * paths produce bit-equal centroids and assignments (KmeansSpec pins
    * path parity). Larger point sets run the distributed loop
    * unchanged. */
  def trainQuantized(quantized: DataFrame, k: Int, iters: Int,
                     driverPointLimit: Long = 1L << 16): (Array[Array[Long]], DataFrame) = {
    // cache ownership: only persist (and later unpersist) when the CALLER
    // hasn't — unpersisting a caller-cached input here silently dropped
    // its cache mid-job (IvfPq re-derived residuals from a fresh scan
    // after coarse training for exactly this reason)
    val wasCached =
      quantized.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val pts = if (wasCached) quantized else quantized.persist()
    try {
      if (pts.count() <= driverPointLimit) return driverLloyd(pts, k, iters)
      // init: the k smallest-id vectors, centroid index = id rank
      var cents: Array[Array[Long]] = pts.orderBy("id").limit(k).collect()
        .map(_.getSeq[Long](1).toArray)
      require(cents.length == k, s"need >= $k vectors, got ${cents.length}")
      for (_ <- 1 to iters) {
        // sum each component per cluster: k·dim grouped longs (bounded)
        val sums = assign(pts, cents)
          .select(col("cluster"), posexplode(col("p")).as(Seq("pos", "x")))
          .groupBy("cluster", "pos")
          .agg(sum("x").as("s"), count(lit(1)).as("cnt"))
          .collect()
        val next = cents.map(_.clone()) // empty cluster keeps its centroid
        sums.foreach { r =>
          // all components non-negative => trunc == floor, order-free
          next(r.getInt(0))(r.getInt(1)) = r.getLong(2) / r.getLong(3)
        }
        cents = next
      }
      (cents, assign(pts, cents).select("id", "cluster", "dist"))
    } finally if (!wasCached) pts.unpersist()
  }

  /** The exact integer Lloyd recurrence in driver arrays — see
    * [[trainQuantized]]'s gate comment for the bit-parity argument. The
    * returned assignment relation is driver-built (LocalRelation), which
    * downstream consumers aggregate/join exactly like the distributed
    * form. */
  private def driverLloyd(pts: DataFrame, k: Int,
                          iters: Int): (Array[Array[Long]], DataFrame) = {
    val spark = pts.sparkSession
    import spark.implicits._
    val rows: Array[(Long, Array[Long])] =
      pts.select(col("id"), col("p")).as[(Long, Array[Long])].collect()
    val byId = rows.sortBy(_._1)
    var cents = byId.take(k).map(_._2.clone())
    require(cents.length == k, s"need >= $k vectors, got ${cents.length}")
    val dim = cents(0).length
    // argmin over the current centroids: (first minimal index, distance)
    def nearest(p: Array[Long], cs: Array[Array[Long]]): (Int, Long) = {
      var bestC = 0; var bestD = Long.MaxValue
      var c = 0
      while (c < cs.length) {
        val ct = cs(c)
        var d = 0L; var i = 0
        while (i < dim) { val x = p(i) - ct(i); d += x * x; i += 1 }
        if (d < bestD) { bestD = d; bestC = c } // strict <: ties keep first
        c += 1
      }
      (bestC, bestD)
    }
    for (_ <- 1 to iters) {
      val sums = Array.fill(k)(new Array[Long](dim))
      val cnts = new Array[Long](k)
      rows.foreach { case (_, p) =>
        val (c, _) = nearest(p, cents)
        var i = 0
        while (i < dim) { sums(c)(i) += p(i); i += 1 }
        cnts(c) += 1L
      }
      val next = cents.map(_.clone()) // empty cluster keeps its centroid
      var c = 0
      while (c < k) {
        if (cnts(c) > 0L) {
          var i = 0
          while (i < dim) { next(c)(i) = sums(c)(i) / cnts(c); i += 1 }
        }
        c += 1
      }
      cents = next
    }
    val fc = cents
    val out = rows.toSeq.map { case (id, p) =>
      val (c, d) = nearest(p, fc)
      (id, c, d)
    }.toDF("id", "cluster", "dist")
    (cents, out)
  }

  /** Assignment-only entry: (id, cluster, dist) after `iters` rounds. */
  def lloyd(df: DataFrame, idCol: String, vecCol: String,
            k: Int = 8, iters: Int = 4, dim: Int = 64): DataFrame =
    train(df, idCol, vecCol, k, iters, dim)._2
}
