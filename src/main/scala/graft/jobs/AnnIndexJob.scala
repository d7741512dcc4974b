package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.lake.LakeTable

/** Materialized ANN index — the persistent vector collection the reference
  * keeps in Chroma (chroma_store.py:33-61: embeddings upserted once,
  * queried many times) rebuilt as committed IVF-flat tables:
  *
  *   build   vectors → centroids table + cell-assigned vector lists,
  *           snapshot-committed (append-only: later builds ADD vectors,
  *           assigned with the FIRST build's centroids, so cell ids stay
  *           stable; re-training centroids = a new index root, exactly like
  *           PipelineJob's index generations)
  *   search  queries probe their nProbe nearest centroids and scan ONLY the
  *           probed cells' vectors from the committed files — the corpus is
  *           never touched at query time
  *   compact merge all live cell segments into one (key `ann-compact-vN`),
  *           so unbounded append counts never degrade query-time unions
  *   tombstone per-id delete markers honored by search/compact via the
  *           tv>sv version rule — tombstone + re-append = per-id vector
  *           UPSERT (the reference's chroma upsert, chroma_store.py:33-61)
  *
  * Layout lever: cell lists are written repartitioned+sorted by cell id, so
  * the probed-cell filter prunes via parquet min/max row-group stats — at
  * 10^9 vectors a search reads ~nProbe/nCells of the index bytes, which is
  * the IVF cost envelope realized at the STORAGE layer, not just in the
  * join. The probed-cell set collected to the driver is bounded by nCells
  * ints (legitimately tiny, like the centroid broadcast).
  *
  * Determinism mirrors [[graft.sim.Knn.ivfTopK]] exactly (sampled
  * smallest-id centroids with the wrong-dim guard, max-cosine assignment
  * with smallest-index ties, 6-dp rounding), so the same DuckDB oracle
  * covers the materialized path.
  */
object AnnIndexJob extends Serializable {

  /** Append one vector segment. First build also commits the centroid
    * table; later builds reuse it (stable cell ids). `facetCols` names
    * metadata columns on `vectors` to commit beside the cells as the
    * segment's facet table (id, facets...) — the queryable metadata of the
    * reference's chroma collection (chroma_store.py: documents carry
    * metadata dicts; question_rag.py queries with where=). Returns the
    * committed version. */
  def build(spark: SparkSession, vectors: DataFrame, idCol: String, vecCol: String,
            indexRoot: String, nCells: Int = 16, dim: Int = 64,
            facetCols: Seq[String] = Nil): Int = {
    import spark.implicits._
    val lake = new LakeTable(indexRoot)
    val v = lake.currentVersion + 1
    val vecs = vectors.select(col(idCol).cast("string").as("id"),
      col(vecCol).cast("array<double>").as("vec"))

    val cents: Array[Array[Double]] =
      if (v == 1) {
        // sampled-centroid training, identical to Knn.ivfTopK: the nCells
        // smallest ids (native order of the id column) with the dim guard
        val cs = vectors
          .select(col(idCol), col(vecCol).cast("array<double>").as("c"))
          .filter(size(col("c")) === dim)
          .orderBy(col(idCol)).limit(nCells)
          .collect().map(_.getAs[scala.collection.Seq[Double]]("c").toArray)
        cs.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
          .toDF("cidx", "cvec")
          .coalesce(1).write.mode("overwrite").parquet(s"$indexRoot/data/v1/centroids")
        cs
      } else readCentroids(spark, indexRoot)
    val bc = spark.sparkContext.broadcast(cents)

    val members = vecs.as[(String, Array[Double])]
      .mapPartitions(_.flatMap { case (id, vec) =>
        if (vec == null || vec.length != dim) Iterator.empty
        else Iterator.single((id, cellOf(bc.value, vec, dim), vec))
      }).toDF("id", "cell", "vec")
    // sorted-by-cell layout: the probed-cell filter prunes row groups.
    // `sv` = the segment's commit version (constant column, RLE ≈ free):
    // the tombstone tv>sv comparison needs each row's segment age.
    members.withColumn("sv", lit(v))
      .repartition(col("cell")).sortWithinPartitions("cell")
      .write.mode("overwrite").parquet(s"$indexRoot/data/v$v/cells")
    if (facetCols.nonEmpty)
      vectors.select((col(idCol).cast("string").as("id") +: facetCols.map(col)): _*)
        .dropDuplicates("id").withColumn("sv", lit(v))
        .write.mode("overwrite").parquet(s"$indexRoot/data/v$v/facets")

    lake.commit(lake.listParquet(s"$indexRoot/data/v$v"), Seq(s"ann-segment-v$v"),
      Nil, Map("n_cells" -> cents.length.toDouble))
    v
  }

  /** Top-k per query against the committed index: probe nProbe cells, scan
    * only those cells' vectors, exact cosine, rank window. Queries never
    * touch the build-side corpus. */
  def search(spark: SparkSession, indexRoot: String, queries: DataFrame,
             idCol: String, vecCol: String, k: Int, nProbe: Int = 2,
             dim: Int = 64, facetWhere: Option[String] = None): DataFrame = {
    import spark.implicits._
    val lake = new LakeTable(indexRoot)
    require(lake.currentVersion > 0, s"no committed ANN index at $indexRoot")
    val cents = readCentroids(spark, indexRoot)
    val bc = spark.sparkContext.broadcast(cents)

    val qprobes = queries
      .select(col(idCol).cast("string").as("qid"), col(vecCol).cast("array<double>").as("qvec"))
      .as[(String, Array[Double])]
      .mapPartitions(_.flatMap { case (qid, vec) =>
        if (vec == null || vec.length != dim) Iterator.empty
        else cellsOf(bc.value, vec, dim, nProbe).iterator.map(c => (qid, c, vec))
      }).toDF("qid", "cell", "qvec")

    // the probed-cell set is <= nCells ints — a scalar-sized driver collect
    // that turns the cell filter into storage-level pruning
    val probed = qprobes.select("cell").distinct().as[Int].collect().toSeq
    // liveCells: probed-cell filter FIRST (storage-level pruning; the
    // tombstone anti-join and the defensive distinct against identical
    // re-appends are both bounded by probe selectivity, not index size).
    // Same-id DIFFERENT-vector updates are first-class now: tombstone the
    // id, then build a segment with the new vector ([[tombstone]]).
    val cells0 = liveCells(spark, lake, _.filter(col("cell").isin(probed: _*)))
    // metadata-filtered vector search (the reference's where=-filtered
    // chroma query): the facet keep-set SEMI-joins the probed-cell rows
    // BEFORE scoring — both sides bounded by probe selectivity, and dead /
    // superseded facet rows die by the same tv>sv rule as cell rows, so an
    // upserted id filters by its NEWEST metadata.
    val cells = facetWhere.fold(cells0) { w =>
      val f = liveFacets(spark, lake).getOrElse(sys.error(
        s"facet filter '$w' but no facets table committed at $indexRoot"))
      cells0.join(f.filter(expr(w)).select("id").dropDuplicates("id"),
        Seq("id"), "left_semi")
    }

    // norms once per side (Knn.cosineWithNorms — bit-identical doubles):
    // one interpreted higher-order dot per candidate instead of three
    val scored = qprobes.withColumn("qnrm", graft.sim.Knn.normCol(col("qvec")))
      .join(cells.withColumn("cnrm", graft.sim.Knn.normCol(col("vec"))), "cell")
      .filter(col("qid") =!= col("id"))
      .select(col("qid"), col("id"),
        round(graft.sim.Knn.cosineWithNorms(col("qvec"), col("vec"),
          col("qnrm"), col("cnrm")), 6).as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(desc("cosine"), asc("id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Commit per-id delete markers (key `ann-tombstone-vN`): every id in
    * `ids` (column `id`) is dead in all cell segments committed BEFORE this
    * call; a later [[build]] may re-append the id with a NEW vector and the
    * newer rows survive the same markers (`tv > sv`) — per-id vector UPSERT,
    * the reference's chroma upsert semantics (chroma_store.py:33-61),
    * without rewriting any segment. */
  def tombstone(spark: SparkSession, indexRoot: String, ids: DataFrame): Int = {
    val lake = new LakeTable(indexRoot)
    require(lake.currentVersion > 0, s"no committed ANN index at $indexRoot")
    val v = lake.currentVersion + 1
    ids.select(col("id").cast("string").as("id")).dropDuplicates("id")
      .withColumn("tv", lit(v))
      .write.mode("overwrite").parquet(s"$indexRoot/data/v$v/tombstones")
    lake.commit(lake.listParquet(s"$indexRoot/data/v$v"),
      Seq(s"ann-tombstone-v$v"), Nil, Map.empty)
    v
  }

  private val AnnCompactKey = "ann-compact-v(\\d+)".r
  private val CellsFile = ".*/data/v(\\d+)/cells/.*\\.parquet".r
  private val TombFile = ".*/data/v(\\d+)/tombstones/.*\\.parquet".r
  private val FacetFile = ".*/data/v(\\d+)/facets/.*\\.parquet".r

  /** Live facet rows (None when no live segment committed facets):
    * manifest-resolved like cells, same version floor, same tv>sv
    * tombstone rule — a tombstoned-then-reappended id keeps only its
    * newest metadata row. */
  private def liveFacets(spark: SparkSession, lake: LakeTable): Option[DataFrame] = {
    val floor = compactFloor(lake)
    val facetFiles = lake.state.fileVersions.map(_._1).collect {
      case f @ FacetFile(v) if v.toInt >= floor => f
    }
    if (facetFiles.isEmpty) None
    else {
      val tombFiles = lake.state.fileVersions.map(_._1).collect {
        case f @ TombFile(v) if v.toInt >= floor => f
      }
      val f = spark.read.parquet(facetFiles: _*)
      val alive =
        if (tombFiles.isEmpty) f
        else {
          val tb = spark.read.parquet(tombFiles: _*)
          f.join(tb, f("id") === tb("id") && tb("tv") > f("sv"), "left_anti")
        }
      Some(alive.drop("sv").distinct())
    }
  }

  /** Live cell rows: manifest-resolved union of live cell files, minus
    * rows whose id has a live tombstone newer than the row's segment
    * (tv > sv), with `sv` dropped and the defensive distinct applied AFTER
    * the version filter (identical re-appends at different versions must
    * still collapse to one row). `preFilter` narrows the scan (probed-cell
    * pruning) before the anti-join. */
  private def liveCells(spark: SparkSession, lake: LakeTable,
                        preFilter: DataFrame => DataFrame): DataFrame = {
    val floor = compactFloor(lake)
    val tombFiles = lake.state.fileVersions.map(_._1).collect {
      case f @ TombFile(v) if v.toInt >= floor => f
    }
    val cells = preFilter(spark.read.parquet(liveCellFiles(lake): _*))
    val alive =
      if (tombFiles.isEmpty) cells
      else {
        val tb = spark.read.parquet(tombFiles: _*)
        cells.join(tb, cells("id") === tb("id") && tb("tv") > cells("sv"), "left_anti")
      }
    alive.drop("sv").distinct()
  }

  private def compactFloor(lake: LakeTable): Int = {
    val compactedAt = lake.committedKeys.collect {
      case AnnCompactKey(n) => n.toInt
    }.foldLeft(0)(math.max)
    math.max(1, compactedAt)
  }

  /** Live cell files, **manifest-resolved** (`lake.state.fileVersions`, the
    * same object-store-friendly liveness discipline as ExtractJob/IndexJob
    * — never a `Files.exists` probe): cell files of versions at or after
    * the newest compaction. Compacted-away segment dirs stay on disk for
    * time travel but leave the query union. */
  private def liveCellFiles(lake: LakeTable): Seq[String] = {
    val floor = compactFloor(lake)
    val files = lake.state.fileVersions.map(_._1).collect {
      case f @ CellsFile(v) if v.toInt >= floor => f
    }
    require(files.nonEmpty, s"no live cell segments committed at ${lake.root}")
    files
  }

  /** Merge every live cell segment into ONE (key `ann-compact-vN`),
    * bounding [[search]]'s union to a single segment again — the unbounded-
    * append-count fix, mirroring IndexJob.compact. Merge semantics mirror
    * search's own defensive read exactly (distinct over identical
    * re-appended rows), so search results are provably identical before and
    * after (AnnIndexSpec). Old dirs stay for snapshot time travel. */
  def compact(spark: SparkSession, indexRoot: String): Int = {
    val lake = new LakeTable(indexRoot)
    require(lake.currentVersion > 0, s"no committed ANN index at $indexRoot")
    // tombstoned rows are PURGED here; the markers retire with the
    // pre-compaction versions (compactFloor moves past them)
    val merged = liveCells(spark, lake, identity)
    val facets = liveFacets(spark, lake)
    val v = lake.currentVersion + 1
    // keep the sorted-by-cell layout: row-group pruning must survive merges
    merged.withColumn("sv", lit(v))
      .repartition(col("cell")).sortWithinPartitions("cell")
      .write.mode("overwrite").parquet(s"$indexRoot/data/v$v/cells")
    // facets ride the compaction: tombstoned rows purged with their cells,
    // one deterministic row per id (winner by facet payload, the IndexJob
    // rule), markers retire as compactFloor moves past them
    facets.foreach { f =>
      val payload = f.columns.filterNot(_ == "id")
      val fw = org.apache.spark.sql.expressions.Window.partitionBy("id")
        .orderBy(payload.map(col): _*)
      f.withColumn("__graft_rn", row_number().over(fw))
        .filter(col("__graft_rn") === 1).drop("__graft_rn")
        .withColumn("sv", lit(v))
        .write.mode("overwrite").parquet(s"$indexRoot/data/v$v/facets")
    }
    lake.commit(lake.listParquet(s"$indexRoot/data/v$v"),
      Seq(s"ann-compact-v$v"), Nil, Map.empty)
    v
  }

  private def readCentroids(spark: SparkSession, indexRoot: String): Array[Array[Double]] =
    spark.read.parquet(s"$indexRoot/data/v1/centroids")
      .orderBy("cidx")
      .collect().map(_.getAs[scala.collection.Seq[Double]]("cvec").toArray)

  private def cellOf(cents: Array[Array[Double]], vec: Array[Double], dim: Int): Int =
    cellsOf(cents, vec, dim, 1)(0)

  /** Top `n` centroid indices by (cosine desc, index asc) — identical
    * arithmetic to Knn.ivfTopK.cellRanks. */
  private def cellsOf(cents: Array[Array[Double]], vec: Array[Double], dim: Int,
                      n: Int): Array[Int] = {
    val cos = new Array[Double](cents.length)
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      var dot = 0.0; var nv = 0.0; var nc = 0.0
      var i = 0
      while (i < dim) { dot += vec(i) * c(i); nv += vec(i) * vec(i); nc += c(i) * c(i); i += 1 }
      cos(j) = dot / math.max(math.sqrt(nv) * math.sqrt(nc), 1e-12)
      j += 1
    }
    (0 until cents.length).sortBy(j => (-cos(j), j)).take(n).toArray
  }
}
