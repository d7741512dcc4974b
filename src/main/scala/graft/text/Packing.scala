package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing for LM pretraining — assign documents/chunks
  * (id, tokens) to fixed-budget training sequences by GREEDY CONCATENATION
  * in id order: a document starts at global token offset
  * prefix = Σ tokens of all earlier ids and may straddle a sequence
  * boundary (concat-and-split packing, the standard pretraining form).
  * Output: (id, tokens, seq_id = prefix / seqLen, seq_offset = prefix %
  * seqLen).
  *
  * Scale note — why this is NOT a window: the defining expression is a
  * GLOBAL prefix sum (`sum() OVER (ORDER BY id)`), and a global-order
  * window in Spark collapses the whole corpus into ONE task. This
  * implementation computes the identical prefix distributively, the
  * classic two-pass scan:
  *   1. range-partition by id + sort within partitions (global order
  *      across partition indices), per-partition token totals to the
  *      driver — numPartitions longs, a scalar-sized collect;
  *   2. exclusive partition offsets broadcast back; each partition runs a
  *      local running sum seeded with its offset.
  * Output values are independent of where the range boundaries land, so
  * the result is deterministic for any partition count (pinned by spec).
  * The per-partition running loop is genuine imperative per-partition
  * logic — the one place the RDD escape hatch is the right tool.
  */
object Packing {

  def packSequences(df: DataFrame, idCol: String, tokensCol: String, seqLen: Long,
                    partitions: Int = 0): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val p = if (partitions > 0) partitions else spark.sparkContext.defaultParallelism
    val sorted = df
      .select(col(idCol).cast("string").as("id"), col(tokensCol).cast("long").as("tokens"))
      .repartitionByRange(p, col("id"))
      .sortWithinPartitions("id")
      .as[(String, Long)]
    // ONE materialized RDD for both passes (same partitioner, same order)
    val rdd = sorted.rdd
    val totals = rdd
      .mapPartitionsWithIndex { case (i, it) =>
        var s = 0L; it.foreach(s += _._2); Iterator.single((i, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = totals.scanLeft(0L)(_ + _) // exclusive prefix per partition
    val bc = spark.sparkContext.broadcast(offsets)
    val len = seqLen
    rdd.mapPartitionsWithIndex { case (i, it) =>
      var prefix = bc.value(i)
      it.map { case (id, t) =>
        val start = prefix
        prefix += t
        (id, t, start / len, start % len)
      }
    }.toDF("id", "tokens", "seq_id", "seq_offset")
  }
}
