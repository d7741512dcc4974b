package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-PQ — the composed inverted-file + product-quantization index
  * (Jégou, Douze, Schmid, TPAMI 2011 §V: "IVFADC"), the standard shape a
  * billion-vector ANN deployment actually runs (what FAISS calls
  * `IVFx,PQy`; the reference hides this layer behind its Chroma collection
  * API, chroma_store.py:33-61). It composes two things this engine already
  * gates independently:
  *
  *   - a TRAINED coarse quantizer ([[Kmeans.trainQuantized]] — fixed-point
  *     Lloyd, the q_kmeans path) partitioning the corpus into `nCells`
  *     inverted lists, and
  *   - per-subspace PQ codebooks ([[Pq]] — the q_pq path) trained on the
  *     RESIDUAL p − centroid(cell), which is what makes IVF-PQ beat plain
  *     PQ: residuals concentrate near 0, so the same ks codes spend their
  *     resolution on a much smaller ball.
  *
  * Search (ADC over probed cells): a query ranks the `nProbe` nearest
  * cells by exact integer distance to the coarse centroids, builds ONE
  * m×ks residual distance table PER probed cell (its residual differs per
  * centroid), and scores only the members of those cells by m table
  * lookups — the IVF pruning and the PQ memory compression compose.
  *
  * Fixed-point exactness: everything runs on the [[Kmeans.Scale]] grid.
  * Residuals are re-offset by [[ResOff]] = 2·Scale so every component
  * stays non-negative (inputs are in [0, 2·Scale] after the quantize
  * offset), keeping Lloyd's integer centroid division trunc==floor and
  * order-free — the same discipline as q_kmeans/q_pq. The DuckDB oracle
  * unrolls the SAME coarse Lloyd, the SAME m residual Lloyd runs, and the
  * SAME per-(query, cell) ADC tables; the gate hash-checks end-to-end
  * with no float contract.
  *
  * Scale shape: coarse training is `citers` bounded collects (nCells·dim
  * longs); codebook training is m bounded collects; residual computation
  * and encoding are ONE narrow pass each (centroids ride a literal /
  * broadcast — no join); scoring is ONE narrow pass over the encoded
  * relation in which each row consults only the queries probing ITS cell
  * (the inverted-list pruning, realized as a broadcast hash-map lookup);
  * the final top-k is a `row_number ≤ k` window (WindowGroupLimit →
  * map-side truncation). At 100 TB the encoded corpus is m bytes/vector
  * and the only shuffle is the rank window over ≤ |queries|·cell-size
  * scored rows.
  */
object IvfPq {

  /** Residual offset: quantized components lie in [0, 2·Scale] (inputs in
    * [−1, 1]), so p − c ∈ [−2·Scale, 2·Scale] and adding 2·Scale keeps
    * every residual component non-negative — the trunc==floor precondition
    * of the integer Lloyd update, in both engines. Constant offsets cancel
    * in every distance. */
  val ResOff: Long = 2 * Kmeans.Scale

  /** Train coarse cells + residual codebooks, encode, and ADC-search the
    * `nQueries` smallest-id vectors — the q_ivfpq gate shape.
    * Output: (qid, id, adist, rank) with rank by (adist asc, id asc). */
  def topK(df: DataFrame, idCol: String, vecCol: String, k: Int,
           nCells: Int = 8, citers: Int = 2, nProbe: Int = 2,
           m: Int = 4, ks: Int = 8, iters: Int = 2, dim: Int = 64,
           nQueries: Int = 8): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val spark = df.sparkSession
    import spark.implicits._
    val sub = dim / m
    val pts = Kmeans.quantize(df, idCol, vecCol, dim).persist()
    try {
      // coarse quantizer: nCells centroids, the q_kmeans trajectory
      val (cents, _) = Kmeans.trainQuantized(pts, nCells, citers)
      // residuals in one narrow pass — centroids as an array literal
      val centLit = typedlit(cents.map(_.toSeq).toSeq)
      val res = Kmeans.assign(pts, cents)
        .select(col("id"), col("cluster").as("cell"),
          zip_with(col("p"), element_at(centLit, col("cluster") + 1),
            (a, b) => a - b + lit(ResOff)).as("r"))
        .persist()
      try {
        // m per-subspace codebooks over residual slices — ONE batched
        // Lloyd loop for all m (Pq.trainSlices: slice-for-slice identical
        // to the m independent trainQuantized runs, iters+1 jobs total
        // instead of m·(iters+1))
        val books: Pq.Codebooks = Pq.trainSlices(
          res.select(col("id"), col("r").as("p")), m, sub, ks, iters)
        val bcBooks = spark.sparkContext.broadcast(books)
        // encode: (id, cell, m argmin codes) — one narrow pass
        val encoded = res.as[(Long, Int, Array[Long])].mapPartitions { it =>
          val bks = bcBooks.value
          it.map { case (id, cell, r) =>
            (id, cell, Array.tabulate(m)(j => Pq.argminCode(r, j * sub, bks(j))))
          }
        }.toDF("id", "cell", "codes")
        // query prep on the driver (bounded: the query batch is small by
        // contract, like the IVF centroid collect): nProbe nearest cells
        // by exact integer distance (ties → smallest cell), one ADC table
        // per (query, probed cell) from the query's residual THERE.
        val qpts = pts.filter(col("id") < nQueries).collect()
          .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
        val tables: Array[(Long, Int, Array[Array[Long]])] =
          qpts.flatMap { case (qid, qp) =>
            cents.zipWithIndex
              .map { case (c, ci) => (Pq.sqDistAt(qp, 0, c), ci) }
              .sorted.take(nProbe)
              .map { case (_, ci) =>
                val qr = Array.tabulate(dim)(i => qp(i) - cents(ci)(i) + ResOff)
                (qid, ci, Array.tabulate(m) { j =>
                  books(j).map(cent => Pq.sqDistAt(qr, j * sub, cent))
                })
              }
          }
        val bcTables = spark.sparkContext.broadcast(tables)
        // score: each encoded row consults only the queries probing its
        // cell — the inverted-list pruning as a broadcast map lookup
        val scored = encoded.as[(Long, Int, Array[Int])].mapPartitions { it =>
          val byCell = bcTables.value.groupBy(_._2)
          it.flatMap { case (id, cell, codes) =>
            byCell.getOrElse(cell, Array.empty).iterator
              .filter(_._1 != id)
              .map { case (qid, _, dt) =>
                var d = 0L
                var j = 0
                while (j < dt.length) { d += dt(j)(codes(j)); j += 1 }
                (qid, id, d)
              }
          }
        }.toDF("qid", "id", "adist")
        val w = Window.partitionBy("qid").orderBy(asc("adist"), asc("id"))
        scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      } finally res.unpersist()
    } finally pts.unpersist()
  }
}
