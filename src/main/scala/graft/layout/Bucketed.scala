package graft.layout

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-partitioned) tables — the co-located-join layout: both
  * sides of a recurring equi-join are written hash-partitioned into the
  * SAME number of buckets on their join key, so the join consumes the
  * on-disk partitioning and the exchange disappears from every future
  * query (`HashClusteredDistribution` satisfied by the bucketed scan).
  * This is THE layout decision for 100-TB fact↔dimension pipelines that
  * join on the same key run after run: the shuffle is paid once at write
  * time, amortized over every read, and bucket-pruning serves point
  * lookups on the key for free.
  *
  * `sortBy` inside each bucket additionally lets the sort-merge join read
  * pre-sorted runs (and gives parquet tight min/max run stats).
  *
  * Bucket metadata lives in the session catalog (`saveAsTable` with an
  * explicit data `path` — an external table: dropping it leaves data).
  * BucketedSpec pins the contract: the two-table join plan contains NO
  * Exchange, and equals the plain shuffled join row-for-row.
  */
object Bucketed {

  /** Write `df` as an external bucketed+sorted parquet table. */
  def write(df: DataFrame, table: String, key: String, nBuckets: Int,
            path: String): Unit =
    df.write.mode("overwrite").option("path", path)
      .bucketBy(nBuckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Equi-join of two co-bucketed tables (each bucketed on ITS join
    * column with the same bucket count) — plans with zero exchanges. */
  def join(spark: SparkSession, left: String, right: String,
           leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(left); val r = spark.table(right)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
