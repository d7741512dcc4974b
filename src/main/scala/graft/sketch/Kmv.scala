package graft.sketch

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) bottom-k signatures (Bar-Yossef et al. 2002;
  * Beyer et al. SIGMOD 2007) — the mergeable SET-similarity sketch: the k
  * smallest distinct md5 hashes of a set are a uniform sample of its
  * distinct values, so for two sets the fraction of the union's bottom-k
  * that lands in both signatures estimates Jaccard:
  *
  *   Ĵ = |B_k(A∪B) ∩ B_k(A) ∩ B_k(B)| / k        (σ ≈ √(J(1−J)/k))
  *
  * This is the per-KEY (whole-set) companion to the per-document MinHash
  * family in [[graft.dedup]] — source-vs-source vocabulary similarity
  * instead of doc-vs-doc near-dup — and it composes with [[Hll]]'s
  * register algebra as the second shard-mergeable set summary.
  *
  * MERGE IS LOSSLESS: B_k(A ∪ B) == bottom-k of (B_k(A) ∪ B_k(B)) —
  * the smallest k of a union can only come from each side's smallest k,
  * so shards sketch independently and signatures union+re-truncate.
  *
  * Determinism: hashes are the engine-wide md5-top-64 masked to 63 bits
  * (DuckDB-replicable); all outputs integer.
  *
  * Plan shape: distinct (key, h) is ONE hash aggregate with map-side
  * partials; the bottom-k window is `row_number <= k` with nothing
  * downstream needing dropped rows — exactly the WindowGroupLimit
  * map-side-truncation shape (each key ships ~k rows per partition, not
  * its whole domain).
  */
object Kmv {

  val K = 256

  /** Bottom-k signature table (key, h): the k smallest distinct 63-bit
    * hashes of `valCol` per key. */
  def signature(df: DataFrame, keyCol: String, valCol: String, k: Int = K): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val h63 = graft.functions.GraftFunctions.md5Top64(col(valCol).cast("string"))
      .bitwiseAND(lit(Long.MaxValue))
    val byH = Window.partitionBy("key").orderBy("h")
    df.select(col(keyCol).cast("string").as("key"), h63.as("h"))
      .groupBy("key", "h").agg(count(lit(1)).as("_n")).drop("_n")
      .withColumn("rn", row_number().over(byH))
      .filter(col("rn") <= k)
      .select("key", "h")
  }

  /** Lossless shard merge: union the signatures, re-truncate to bottom-k.
    * `signature(a ∪ b) == merge(signature(a), signature(b))` exactly. */
  def merge(a: DataFrame, b: DataFrame, k: Int = K): DataFrame = {
    val byH = Window.partitionBy("key").orderBy("h")
    a.unionByName(b).distinct()
      .withColumn("rn", row_number().over(byH))
      .filter(col("rn") <= k)
      .select("key", "h")
  }
}
