package graft.sketch

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Misra–Gries heavy hitters with an exact recheck pass (Misra & Gries
  * 1982; mergeability per Agarwal et al., PODS 2012) — the third mergeable
  * sketch family next to [[Hll]] and [[CountMin]], and the one whose final
  * output is EXACT, not an estimate.
  *
  * Why at 100 TB: "which items exceed 1/(k+1) of the corpus" via plain
  * `groupBy(item)` shuffles the FULL open vocabulary (billions of distinct
  * n-grams). Here each partition keeps at most k counters (pass 1, narrow),
  * and only the ≤ k-per-partition CANDIDATE set is rechecked with exact
  * counts (pass 2: broadcast semi-join + one hash aggregate over candidate
  * rows only). The shuffle never carries the long tail.
  *
  * Completeness is a theorem, not a hope: any item with global count
  * > n/(k+1) has count > n_p/(k+1) in at least one partition p (else the
  * global sum would be ≤ n/(k+1)), and per-partition MG retains every such
  * item (its estimate stays positive: at most n_p/(k+1) decrement events
  * can touch it). The recheck then makes every surviving count exact — so
  * the operator's OUTPUT never depends on sketch error, only its cost does.
  *
  * Determinism: integer-only threshold `cnt·(k+1) > n` (no float contract),
  * output is a set with exact counts — partition-count invariant by
  * construction.
  */
object HeavyHitters {

  /** Frozen gate capacity: θ = n/(K+1) lands between the corpus bigram
    * mean (~30 of ~27k) and max (~50) — selective but non-empty. */
  val K = 767

  /** Pass 1: per-partition Misra–Gries. Emits each partition's surviving
    * candidate items as (item, 0) rows plus ONE (null, n_p) row carrying
    * the partition's item count — so the global total n rides the same
    * scan instead of a second pass. Decrement events are O(k) each but at
    * most n_p/(k+1) of them occur, so the pass is O(n_p) amortized. */
  def summarize(items: Dataset[String], k: Int): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    items.mapPartitions { it =>
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      var np = 0L
      while (it.hasNext) {
        val x = it.next()
        np += 1
        m.get(x) match {
          case Some(v) => m(x) = v + 1
          case None if m.size < k => m(x) = 1L
          case None =>
            m.mapValuesInPlace((_, v) => v - 1)
            m.filterInPlace((_, v) => v > 0)
        }
      }
      m.keysIterator.map(item => (item, 0L)) ++ Iterator((null: String, np))
    }.toDF("item", "np")
  }

  /** Exact heavy hitters of `df(itemCol)`: all items with cnt·(k+1) > n,
    * with their EXACT counts, as (item, cnt). Plan: ONE pass-1 action
    * (narrow mapPartitions, ≤ k+1 output rows per partition, read at the
    * driver — bounded by (k+1)·partitions, the same bounded-collect class
    * as the IVF centroid reads), then pass 2 = broadcast semi-join + one
    * hash aggregate over candidate rows only + integer threshold filter.
    * Exactly the textbook two-pass algorithm: the full-item shuffle never
    * happens. */
  def exact(df: DataFrame, itemCol: String, k: Int = K): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val items0 = df.select(col(itemCol).cast("string").as("item"))
    val rows = summarize(items0.as[String], k).collect()
    val n = rows.iterator.filter(_.isNullAt(0)).map(_.getLong(1)).sum
    val cand = rows.iterator.collect {
      case r if !r.isNullAt(0) => r.getString(0)
    }.toArray.distinct.toSeq
    items0
      .join(broadcast(cand.toDF("item")), Seq("item"), "left_semi")
      .groupBy("item").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * lit(k + 1L) > lit(n))
      .select(col("item"), col("cnt"))
  }
}
