package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse sign random projection (Achlioptas, "Database-friendly random
  * projections: Johnson–Lindenstrauss with binary coins", JCSS 66(4), 2003
  * — published method): JL dimensionality reduction whose matrix entries
  * are {+1, 0, −1} with probabilities {1/6, 2/3, 1/6}, so a projection is
  * additions only — no float multiplies, and two thirds of the terms
  * vanish. The cheap front-end for every embedding operator here: project
  * dim-64 vectors to k dims and the downstream KNN/IVF/clustering passes
  * touch k/64 of the data. (The reference keeps raw vectors behind its
  * Chroma API, chroma_store.py:33-61; JL projection is the standard way a
  * 100-TB embedding corpus gets cheap enough to iterate on.)
  *
  * Determinism: the matrix never materializes as data — cell (j, i) is
  * md5-derived ([[graft.Hashing.md5Long]] of `"rp:j:i"`, masked to 63 bits,
  * mod 6 → {0:+1, 1:−1, 2..5:0}), so any engine reproduces it bit-exactly
  * and a rerun of the job is the identical subset. Inputs ride the
  * [[Kmeans.Scale]] fixed-point grid (`floor(x · 2^15)` — one correctly
  * rounded multiply, bit-exact cross-engine); projections are then integer
  * sums of integer terms: hash-exact end-to-end, the scaled-integer
  * discipline — no float contract anywhere.
  *
  * Scale shape: the k×dim sign matrix is built on the driver from the hash
  * (k·dim bytes — corpus-independent) and embedded as literals; projection
  * is ONE narrow codegen'd pass (`zip_with`/`aggregate` per output dim),
  * zero shuffles, zero UDFs. Long-format output keeps the gate's compare
  * schema flat.
  */
object Projection {

  /** Deterministic Achlioptas sign for matrix cell (j, i). */
  def sign(j: Int, i: Int): Int =
    ((graft.Hashing.md5Long(s"rp:$j:$i") & Long.MaxValue) % 6) match {
      case 0L => 1
      case 1L => -1
      case _  => 0
    }

  /** Row-major k×dim sign matrix. */
  def signMatrix(k: Int, dim: Int): Array[Array[Long]] =
    Array.tabulate(k, dim)((j, i) => sign(j, i).toLong)

  /** (id BIGINT, j INT, y BIGINT): exact fixed-point projection of each
    * in-shape vector onto the k hash-derived sign rows. Malformed vectors
    * (null / wrong length) are excluded, as across the ANN family. */
  def project(df: DataFrame, idCol: String, vecCol: String,
              k: Int, dim: Int): DataFrame = {
    val rows = signMatrix(k, dim)
    val q = quantized(df, idCol, vecCol, dim)
    def dot(row: Array[Long]): Column =
      aggregate(zip_with(col("p"), typedlit(row.toSeq), (a, b) => a * b),
        lit(0L), (acc, x) => acc + x)
    q.select(col("id"), posexplode(array(rows.map(dot).toIndexedSeq: _*)))
      .select(col("id"), col("pos").as("j"), col("col").as("y"))
  }

  /** (id, p): in-shape vectors on the 2^15 fixed-point grid. */
  private def quantized(df: DataFrame, idCol: String, vecCol: String,
                        dim: Int): DataFrame =
    df.filter(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .select(col(idCol).cast("long").as("id"),
        transform(col(vecCol),
          x => floor(x.cast("double") * Kmeans.Scale).cast("long")).as("p"))

  /** JL-shortlisted exact KNN — the projection's downstream payoff: score
    * the corpus against each query in the kProj-dim projected space (a
    * kProj/dim-width integer scan), keep a `shortlist`-deep candidate set
    * per query (`row_number ≤ cap` → WindowGroupLimit, map-side partial
    * truncation), then re-rank ONLY the shortlist with the exact dim-wide
    * distance. At 100 TB the full-width vectors are touched for
    * nQueries·shortlist rows instead of nQueries·corpus.
    *
    * Determinism: both distances are integer sums on the fixed-point grid
    * (projected values are integer already) — hash-exact, ties broken by
    * id at both stages; JL recall loss is a property of the shortlist CUT,
    * not of any float. Queries are the `id < nQueries` corpus rows (the
    * IVF/PQ convention), joined via a broadcast nested-loop over nQueries
    * rows — the corpus never shuffles until the per-query window on
    * nQueries keys, which WindowGroupLimit truncates map-side first.
    *
    * Output: (qid, id, edist, rank) — exact squared grid distance, rank
    * 1..k per query. */
  def shortlistTopK(df: DataFrame, idCol: String, vecCol: String,
                    k: Int, kProj: Int, dim: Int, shortlist: Int,
                    nQueries: Int): DataFrame = {
    val rows = signMatrix(kProj, dim)
    def dots(c: Column): Column =
      array(rows.map(row =>
        aggregate(zip_with(c, typedlit(row.toSeq), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x)).toIndexedSeq: _*)
    val base = quantized(df, idCol, vecCol, dim)
      .select(col("id"), col("p"), dots(col("p")).as("proj"))
    val queries = base.filter(col("id") < nQueries)
      .select(col("id").as("qid"), col("p").as("qp"), col("proj").as("qproj"))
    def sqSum(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, x) => acc + x)
    val wShort = Window.partitionBy("qid").orderBy(asc("pdist"), asc("id"))
    val short = base.crossJoin(broadcast(queries))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"), col("p"), col("qp"),
        sqSum(col("proj"), col("qproj")).as("pdist"))
      .withColumn("rn", row_number().over(wShort))
      .filter(col("rn") <= shortlist)
    val wK = Window.partitionBy("qid").orderBy(asc("edist"), asc("id"))
    short.select(col("qid"), col("id"), sqSum(col("p"), col("qp")).as("edist"))
      .withColumn("rank", row_number().over(wK))
      .filter(col("rank") <= k)
  }
}
