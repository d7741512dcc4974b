package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (Array[Float]) — brute-force
  * cosine top-k baseline plus an LSH-bucketed scale path.
  *
  * The vector math stays in higher-order built-ins (zip_with/aggregate), so
  * the whole scorer is Catalyst expressions — no UDF, no collect.
  */
object Knn {

  /** Dot product of two array<double> columns — the index-order sum
    * [[cosineCol]] uses (higher-order fns are CodegenFallback: each
    * evaluation is interpreted lambda calls, so pair-scoring paths should
    * evaluate as FEW of these as possible per pair — see [[normCol]]). */
  def dotCol(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  /** Euclidean norm of an array<double> column — identical arithmetic to
    * [[cosineCol]]'s na/nb terms. Pair scorers precompute this ONCE per
    * vector and carry it beside the vector, so each pair evaluates one
    * interpreted higher-order dot instead of three (dot + two norms):
    * bit-identical doubles (same operand values, same op order), ~3× less
    * interpreted work on the hot pair path. */
  def normCol(a: Column): Column =
    sqrt(aggregate(a, lit(0.0d), (acc, v) => acc + v * v))

  /** Cosine similarity of two array<float/double> columns. */
  def cosineCol(a: Column, b: Column): Column =
    dotCol(a, b) / greatest(normCol(a) * normCol(b), lit(1e-12d))

  /** Cosine from a precomputed-norm pair — the exact [[cosineCol]] value
    * (dot / greatest(na·nb, 1e-12)) with na/nb read from columns. */
  def cosineWithNorms(vecA: Column, vecB: Column, nrmA: Column, nrmB: Column): Column =
    dotCol(vecA, vecB) / greatest(nrmA * nrmB, lit(1e-12d))

  /** `round(cosineWithNorms(...), 6)` replayed in plain Scala loops —
    * bit-identical to the Catalyst evaluation: the dot is the same
    * left-fold over indices ((0 + a₀b₀) + a₁b₁ …) that
    * aggregate(zip_with(a, b, *)) performs; greatest == max on non-NaN
    * norms; and Spark's Round(double, 6, HALF_UP) is literally
    * `BigDecimal(d).setScale(6, HALF_UP).toDouble` with NaN/Inf passed
    * through (RoundBase, mathExpressions.scala), reproduced verbatim.
    * Exists so hot pair-verification paths can evaluate the threshold in
    * a typed map instead of an interpreted CodegenFallback expression
    * (KnnSpec pins equality against the Column form). */
  def pairCosineRound6(va: Array[Double], vb: Array[Double],
                       na: Double, nb: Double): Double = {
    // Catalyst yields NULL for null/length-mismatched arrays (zip_with
    // pads with null, the aggregate null-poisons) and a null filter drops
    // the row — NaN reproduces the "never passes the threshold" outcome
    if (va == null || vb == null || va.length != vb.length) return Double.NaN
    var dot = 0.0
    var i = 0
    val n = va.length
    while (i < n) { dot += va(i) * vb(i); i += 1 }
    val cos = dot / math.max(na * nb, 1e-12)
    if (cos.isNaN || cos.isInfinite) cos
    else BigDecimal(cos).setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** Brute-force top-k neighbors of one query vector.
    * Scale shape: map + TakeOrderedAndProject — embarrassingly parallel,
    * no shuffle of the corpus. */
  def topK(df: DataFrame, idCol: String, vecCol: String, query: Array[Float], k: Int): DataFrame = {
    val q = typedLit(query.map(_.toDouble))
    df.select(col(idCol).as("id"),
        round(cosineCol(col(vecCol).cast("array<double>"), q), 6).as("cosine"))
      .orderBy(desc("cosine"), asc("id"))
      .limit(k)
  }

  /** The deterministic sign-projection planes (seed-fixed, same on every
    * executor — regenerated per partition, never shipped). */
  def planes(tables: Int, bits: Int, dim: Int): Array[Array[Array[Double]]] = {
    val rnd = new java.util.SplittableRandom(0x51417eedL)
    Array.fill(tables, bits, dim)(rnd.nextGaussian())
  }

  /** All-pairs k-NN join via sign-random-projection LSH buckets: vectors
    * agreeing on `bits` hyperplane signs land in the same bucket; only
    * within-bucket pairs are scored. The multi-probe union over `tables`
    * independent sign sets trades recall for cost the standard way.
    *
    * Bucket ids are computed in a narrow typed map (plain dot-product
    * loops): the tables×bits×dim plane tensor as a Catalyst literal put
    * ~2k doubles of lambda evaluation on every row; per-partition Scala
    * loops do the same arithmetic at memory speed and emit only
    * (id, tbl, bucket). */
  def lshBuckets(df: DataFrame, idCol: String, vecCol: String,
                 bits: Int = 12, tables: Int = 3, dim: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("string").as("id"), col(vecCol).cast("array<double>").as("vec"))
      .as[(String, Array[Double])]
      .mapPartitions { it =>
        val ps = planes(tables, bits, dim)
        it.flatMap { case (id, vec) =>
          // dim contract: a malformed embedding (null / wrong length) emits
          // NO buckets — the row is excluded from ANN rather than silently
          // truncated/zero-padded, keeping the Scala path and the DuckDB
          // oracle (list_dot_product over exactly dim-element lists) in
          // agreement on malformed rows.
          if (vec == null || vec.length != dim) Iterator.empty
          else (0 until tables).iterator.map { t =>
            var bucket = 0L
            var b = 0
            while (b < bits) {
              val plane = ps(t)(b)
              var dot = 0.0
              var i = 0
              while (i < dim) { dot += plane(i) * vec(i); i += 1 }
              bucket = bucket * 2 + (if (dot > 0) 1L else 0L)
              b += 1
            }
            (id, t, bucket)
          }
        }
      }
      .toDF("id", "tbl", "bucket")
  }

  /** Unordered candidate pairs (id_a < id_b) from capped LSH buckets.
    *
    * Scale shape (mirrors MinHash.nearDupPairs): the bucket shuffle carries
    * ONLY (id, tbl, bucket) — Catalyst prunes the vector before the exchange
    * — and bucket membership is capped at `maxBucket` sorted members, so a
    * degenerate corpus of near-identical embeddings (exactly what embedding
    * dedup targets) generates O(n·cap) pairs per table instead of O(n²).
    * Vectors are re-joined by id only for the candidate pairs that survive.
    * The cap drops candidates past `maxBucket` per bucket — at default
    * settings that only binds on pathological clusters; widen
    * `bits`/`maxBucket` if recall on dense clusters matters more than cost.
    * Drops are observable via `drops` (dropped_members / overflow_buckets),
    * never silent when the caller asks. */
  private def candidatePairs(df: DataFrame, idCol: String, vecCol: String,
                             bits: Int, tables: Int, dim: Int, maxBucket: Int,
                             drops: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    val ids = lshBuckets(df, idCol, vecCol, bits, tables, dim)
      .select(col("id"), col("tbl"), col("bucket"))
    // pre-cap per bucket via spillable window rank (see MinHash.nearDupPairs):
    // the collect_list below only ever aggregates <= maxBucket survivors
    val ranked = ids.withColumn("rn", row_number().over(
      Window.partitionBy("tbl", "bucket").orderBy("id")))
    val observed = drops.fold(ranked)(o => ranked.observe(o,
        sum(when(col("rn") > maxBucket, 1L).otherwise(0L)).as("dropped_members"),
        sum(when(col("rn") === maxBucket + 1, 1L).otherwise(0L)).as("overflow_buckets")))
    observed
      .filter(col("rn") <= maxBucket)
      .groupBy("tbl", "bucket")
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(expr(
        "filter(flatten(transform(ids, (a, i) -> transform(slice(ids, i + 2, size(ids)), b -> struct(a, b)))), p -> p.a < p.b)"
      )).as("p"))
      .select(col("p.a").as("id_a"), col("p.b").as("id_b"))
      .distinct()
  }

  /** Approximate nearest neighbor per query id against the corpus: bucketed
    * candidates (capped, id-only shuffle), exact cosine on candidates only,
    * top-k per query. */
  def annTopK(df: DataFrame, idCol: String, vecCol: String, k: Int,
              bits: Int = 10, tables: Int = 3, dim: Int = 64,
              maxBucket: Int = 256,
              drops: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    val vecs = df.select(col(idCol).cast("string").as("id"), col(vecCol).cast("array<double>").as("vec"))
      .withColumn("nrm", normCol(col("vec")))
    val und = candidatePairs(df, idCol, vecCol, bits, tables, dim, maxBucket, drops)
    // both directions: each member of an unordered pair queries the other
    val pairs = und.unionByName(
      und.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
    val scored = pairs
      .join(vecs.select(col("id").as("id_a"), col("vec").as("vec_a"),
        col("nrm").as("nrm_a")), "id_a")
      .join(vecs.select(col("id").as("id_b"), col("vec").as("vec_b"),
        col("nrm").as("nrm_b")), "id_b")
      .select(col("id_a"), col("id_b"), round(cosineWithNorms(col("vec_a"),
        col("vec_b"), col("nrm_a"), col("nrm_b")), 6).as("cosine"))
    val w = Window.partitionBy("id_a").orderBy(desc("cosine"), asc("id_b"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** IVF-flat approximate nearest neighbor — the coarse-quantizer scale
    * path beside the sign-LSH variant (the two standard ANN families).
    *
    * Deterministic "training": the coarse centroids are the `nCells`
    * corpus vectors with the smallest ids (sampled-centroid IVF — the
    * cheap published variant; no Lloyd iterations, so the whole operator
    * is exactly reproducible in the DuckDB oracle). Every vector is
    * assigned to its max-cosine centroid (tie → smallest centroid index);
    * a query probes its `nProbe` nearest cells and scores exact cosine
    * against ONLY those cells' members.
    *
    * Scale shape: centroids are k·dim doubles — driver-collected once and
    * broadcast (legitimately tiny); cell assignment and query probing are
    * narrow maps emitting (id, cell) rows with no vector payload; the one
    * shuffle joins query probes to cell members on cell id, so a query
    * touches n·nProbe/nCells candidates instead of n — the standard IVF
    * cost envelope. Vectors re-join by id only for surviving candidates.
    * Malformed (wrong-dim) vectors are skipped, as in [[lshBuckets]]. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
              k: Int, nCells: Int = 16, nProbe: Int = 2, dim: Int = 64): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val vecs = corpus.select(col(idCol).cast("string").as("id"),
      col(vecCol).cast("array<double>").as("vec"))
    // centroids: smallest nCells ids in the id column's NATIVE order
    // (matches the oracle's ORDER BY id LIMIT nCells). Malformed vectors
    // (null / wrong dim) are excluded from centroid candidacy with the same
    // guard members and queries get — otherwise one bad row among the
    // smallest ids would make cellRanks index past the array and fail the
    // job instead of skipping the row.
    val cents: Array[Array[Double]] = corpus
      .select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .filter(size(col("v")) === dim)
      .orderBy(col(idCol)).limit(nCells)
      .collect().map(_.getAs[scala.collection.Seq[Double]]("v").toArray)
    val bcCents = spark.sparkContext.broadcast(cents)

    def cellRanks(vec: Array[Double], top: Int): Array[Int] = {
      val cs = bcCents.value
      val cos = new Array[Double](cs.length)
      var j = 0
      while (j < cs.length) {
        val c = cs(j)
        var dot = 0.0; var nv = 0.0; var nc = 0.0
        var i = 0
        while (i < dim) { dot += vec(i) * c(i); nv += vec(i) * vec(i); nc += c(i) * c(i); i += 1 }
        cos(j) = dot / math.max(math.sqrt(nv) * math.sqrt(nc), 1e-12)
        j += 1
      }
      // top `top` centroid indices by (cosine desc, index asc)
      (0 until cs.length).sortBy(j => (-cos(j), j)).take(top).toArray
    }

    val members = vecs.as[(String, Array[Double])]
      .mapPartitions(_.flatMap { case (id, vec) =>
        if (vec == null || vec.length != dim) Iterator.empty
        else Iterator.single((id, cellRanks(vec, 1)(0)))
      }).toDF("id", "cell")
    val qprobes = queries
      .select(col(idCol).cast("string").as("qid"), col(vecCol).cast("array<double>").as("vec"))
      .as[(String, Array[Double])]
      .mapPartitions(_.flatMap { case (qid, vec) =>
        if (vec == null || vec.length != dim) Iterator.empty
        else cellRanks(vec, nProbe).iterator.map(c => (qid, c))
      }).toDF("qid", "cell")

    val cand = qprobes.join(members, "cell")
      .filter(col("qid") =!= col("id"))
      .select(col("qid"), col("id"))
    // query vectors come from the QUERIES relation (not necessarily a
    // subset of the corpus), candidates from the corpus
    val qvecs = queries.select(col(idCol).cast("string").as("qid"),
      col(vecCol).cast("array<double>").as("qvec"))
      .withColumn("qnrm", normCol(col("qvec")))
    val scored = cand
      .join(qvecs, "qid")
      .join(vecs.withColumnRenamed("vec", "cvec")
        .withColumn("cnrm", normCol(col("cvec"))), "id")
      .select(col("qid"), col("id"), round(cosineWithNorms(col("qvec"),
        col("cvec"), col("qnrm"), col("cnrm")), 6).as("cosine"))
    val w = Window.partitionBy("qid").orderBy(desc("cosine"), asc("id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate removal: ANN candidate pairs above
    * `simThreshold` → keep-first by id (the vector-space member of the
    * dedup family: exact-hash / MinHash / SimHash / n-gram / embedding). */
  def dropEmbeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
                            simThreshold: Double = 0.995,
                            bits: Int = 10, tables: Int = 3, dim: Int = 64,
                            maxBucket: Int = 256,
                            drops: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vecs = df.select(col(idCol).cast("string").as("id"), col(vecCol).cast("array<double>").as("vec"))
      .withColumn("nrm", normCol(col("vec")))
    // threshold compares the 6-dp ROUNDED cosine: the raw double can
    // differ from an independent evaluation (e.g. the DuckDB oracle) in
    // the last ulps, so an unrounded compare would make borderline pairs
    // implementation-defined; rounding pins the cut deterministically.
    // Evaluated in a typed map ([[pairCosineRound6]] — bit-identical),
    // NOT a Column filter: the Column form gets pushed into the second
    // attach join's condition, and a CodegenFallback higher-order
    // function there drops that join out of codegen (the semDedup
    // lesson); norms ride the attach joins precomputed.
    val thr = simThreshold
    val losers = candidatePairs(df, idCol, vecCol, bits, tables, dim, maxBucket, drops)
      .join(vecs.select(col("id").as("id_a"), col("vec").as("vec_a"),
        col("nrm").as("nrm_a")), "id_a")
      .join(vecs.select(col("id").as("id_b"), col("vec").as("vec_b"),
        col("nrm").as("nrm_b")), "id_b")
      .select(col("id_b").as("loser"), col("vec_a"), col("vec_b"),
        col("nrm_a"), col("nrm_b"))
      .as[(String, Array[Double], Array[Double], Double, Double)]
      .mapPartitions(_.collect {
        case (loser, va, vb, na, nb)
            if pairCosineRound6(va, vb, na, nb) >= thr => loser
      })
      .toDF("loser")
      .distinct()
    df.join(losers, df(idCol).cast("string") === col("loser").cast("string"), "left_anti")
  }

  /** SemDeDup-style CLUSTER-SCOPED semantic dedup (Abbas et al. 2023,
    * arXiv:2303.09540 — published method): assign every embedding to its
    * nearest centroid, then compare pairs only WITHIN a cluster and drop
    * the larger-id member of any pair with cosine ≥ `simThreshold`.
    *
    * This is the scale path the LSH variant ([[dropEmbeddingNearDups]])
    * trades against: no banding tables, one id-only shuffle on the cell
    * key, and the quadratic pair step is bounded per cell by `maxCell`
    * (a `row_number ≤ cap` window — Catalyst's WindowGroupLimit truncates
    * map-side BEFORE the exchange when no observer is attached; cap drops
    * are observable via `drops` exactly like the MinHash/LSH family). At
    * 100 TB, nCells scales with N (cells of ~10³ vectors) so the
    * within-cell join stays bounded while the corpus-sized work remains
    * two narrow passes.
    *
    * Centroid choice reuses [[ivfTopK]]'s deterministic scheme (the
    * nCells smallest-id vectors — oracle-replicable; a k-means refinement
    * changes recall, not the operator shape). Pair semantics match the
    * dedup family: a row is dropped iff it is the larger-id side of ANY
    * qualifying pair (plain pair relation — SQL-expressible, no greedy
    * chain dependence). The cosine is compared 6-dp ROUNDED so borderline
    * pairs are deterministic across engines. */
  def semDedup(df: DataFrame, idCol: String, vecCol: String,
               simThreshold: Double = 0.98, nCells: Int = 16, dim: Int = 64,
               maxCell: Int = 1024,
               drops: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vecs = df.select(col(idCol).cast("string").as("id"),
      col(vecCol).cast("array<double>").as("vec"))
    val cents: Array[Array[Double]] = df
      .select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .filter(size(col("v")) === dim)
      .orderBy(col(idCol)).limit(nCells)
      .collect().map(_.getAs[scala.collection.Seq[Double]]("v").toArray)
    val bcCents = spark.sparkContext.broadcast(cents)
    // local def so the closure captures only the broadcast (not the object)
    def nearestCell(vec: Array[Double]): Int = {
      val cs = bcCents.value
      var bestJ = 0; var bestCos = -2.0
      var j = 0
      while (j < cs.length) {
        val c = cs(j)
        var dot = 0.0; var nv = 0.0; var nc = 0.0
        var i = 0
        while (i < dim) { dot += vec(i) * c(i); nv += vec(i) * vec(i); nc += c(i) * c(i); i += 1 }
        val cos = dot / math.max(math.sqrt(nv) * math.sqrt(nc), 1e-12)
        if (cos > bestCos) { bestCos = cos; bestJ = j }
        j += 1
      }
      bestJ
    }
    val members = vecs.as[(String, Array[Double])]
      .mapPartitions(_.flatMap { case (id, vec) =>
        if (vec == null || vec.length != dim) Iterator.empty
        else Iterator.single((id, nearestCell(vec)))
      }).toDF("id", "cell")
    val ranked = members.withColumn("rn", row_number().over(
      Window.partitionBy("cell").orderBy("id")))
    val observed = drops.fold(ranked)(o => ranked.observe(o,
      sum(when(col("rn") > maxCell, 1L).otherwise(0L)).as("dropped_members"),
      sum(when(col("rn") === maxCell + 1, 1L).otherwise(0L)).as("overflow_cells")))
    val live = observed.filter(col("rn") <= maxCell).select(col("id"), col("cell"))
    // attach (vec, norm) ONCE to the ≤ nCells·maxCell capped membership —
    // the window/cap pipeline stays payload-free (id, cell), and the pair
    // self-join below carries both vectors inline, replacing the two
    // pair-count-sized vector re-joins of the previous shape (pairs are
    // within-cell quadratic, members are not).
    val liveV = live.join(
      vecs.withColumn("nrm", normCol(col("vec"))), Seq("id"))
    // within-cell quadratic verification in ONE typed flatMapGroups over
    // the capped membership: the previous pair self-join materialized
    // |pairs| rows each carrying BOTH dim-wide vectors (quadratic in the
    // cell cap) through join + filter machinery — and a cosine Column
    // filter gets pushed into the join condition, where its
    // CodegenFallback higher-order function drops the join out of
    // whole-stage codegen entirely (measured 4× wall). Here each cell's
    // ≤ maxCell members deserialize once and the pair loop runs on
    // primitive arrays with [[pairCosineRound6]] — bit-identical
    // threshold decisions (same pairs: every a.id < b.id within a cell;
    // same arithmetic), group state bounded by the cap like the join was.
    val thr = simThreshold
    val losers = liveV
      .select(col("cell"), col("id"), col("vec"), col("nrm"))
      .as[(Int, String, Array[Double], Double)]
      .groupByKey(_._1)
      .flatMapGroups { (_: Int, it: Iterator[(Int, String, Array[Double], Double)]) =>
        val ms = it.toArray
        val out = Seq.newBuilder[String]
        var i = 0
        while (i < ms.length) {
          var j = 0
          while (j < ms.length) {
            if (i != j && ms(i)._2 < ms(j)._2 &&
                pairCosineRound6(ms(i)._3, ms(j)._3, ms(i)._4, ms(j)._4) >= thr)
              out += ms(j)._2
            j += 1
          }
          i += 1
        }
        out.result().iterator
      }
      .toDF("loser")
      .distinct()
    df.join(losers, df(idCol).cast("string") === col("loser").cast("string"), "left_anti")
  }
}
