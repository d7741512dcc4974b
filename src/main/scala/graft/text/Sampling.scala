package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-construction operators for training mixes — the sampling /
  * diversification passes web-scale pipelines run after cleaning (the
  * per-source mixture rates and per-domain caps described in the Dolma and
  * FineWeb dataset reports).
  *
  * Both are DETERMINISTIC (hash-based, not Bernoulli-random): a re-run
  * selects the identical subset — the same reproducibility discipline as
  * everything else in the engine, and what makes them oracle-checkable.
  */
object Sampling {

  /** Deterministic per-stratum sampling: keep a row iff
    * md5-top-64(key) masked to 63 bits, mod 100, falls below its stratum's
    * percentage rate. Rows in strata absent from `rates` get
    * `defaultRate`. One narrow filter — no shuffle, no RNG state; the
    * md5-top-64 primitive is the engine-wide oracle-replicable hash
    * (DuckDB: ('0x'||substr(md5(k),1,16))::UBIGINT % ...).
    */
  def stratified(df: DataFrame, keyCol: Column, strataCol: Column,
                 rates: Map[String, Int], defaultRate: Int): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val hashMod = pmod(
      graft.functions.GraftFunctions.md5Top64(keyCol.cast("string"))
        .bitwiseAND(lit(Long.MaxValue)), lit(100L))
    val rateExpr = rates.foldLeft(lit(defaultRate)) { case (acc, (k, v)) =>
      when(strataCol === k, lit(v)).otherwise(acc)
    }
    df.filter(hashMod < rateExpr)
  }

  /** Deterministic EXACT-k per-stratum sample: the k rows with the
    * smallest md5-top-64 key hash in each stratum — a uniform
    * without-replacement sample (hash order is independent of every
    * payload attribute) with the exact count [[stratified]]'s rate form
    * cannot promise on small strata; the eval-set construction primitive.
    * Growth-stable: a new row displaces at most the largest-hash member
    * of its stratum, never reshuffling the rest. Ties (equal hashes)
    * break on the key string — a total order. Plan: `row_number ≤ k`
    * directly above its window → WindowGroupLimit, each stratum ships
    * ≤ k rows per input partition out of the rank exchange. */
  def sampleK(df: DataFrame, keyCol: Column, strataCol: Column, k: Int): DataFrame = {
    require(k >= 1, s"k $k")
    graft.functions.GraftFunctions.register(df.sparkSession)
    val h = graft.functions.GraftFunctions.md5Top64(keyCol.cast("string"))
      .bitwiseAND(lit(Long.MaxValue))
    df.withColumn("__graft_rk", row_number().over(
        Window.partitionBy(strataCol).orderBy(h.asc, keyCol.cast("string").asc)))
      .filter(col("__graft_rk") <= k)
      .drop("__graft_rk")
  }

  /** Deterministic train/val/test split: the row's md5-top-64 hash bucket
    * (mod 100) maps to a split by cumulative range — [0, trainPct) →
    * "train", [trainPct, trainPct+valPct) → "val", the rest → "test".
    * Disjoint and exhaustive by construction, and STABLE UNDER CORPUS
    * GROWTH: a doc's assignment depends only on its own key (unlike
    * Spark's ratio-based randomSplit, where adding rows reshuffles
    * everyone's membership — poison for dedup-then-split pipelines that
    * must never leak a train doc into test across re-runs). One narrow
    * projection — no shuffle, no RNG state. */
  def split(df: DataFrame, keyCol: Column, trainPct: Int, valPct: Int): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split percentages: train=$trainPct val=$valPct")
    graft.functions.GraftFunctions.register(df.sparkSession)
    val hashMod = pmod(
      graft.functions.GraftFunctions.md5Top64(keyCol.cast("string"))
        .bitwiseAND(lit(Long.MaxValue)), lit(100L))
    df.withColumn("split",
      when(hashMod < trainPct, lit("train"))
        .when(hashMod < trainPct + valPct, lit("val"))
        .otherwise(lit("test")))
  }

  /** Per-domain diversification cap: keep at most `maxPerHost` rows per
    * host, first by `order` (FineWeb-style domain balancing). One window
    * shuffle on the host key; rank-limit shape (WindowGroupLimit-able —
    * hot hosts truncate map-side). */
  def capPerHost(df: DataFrame, hostCol: Column, order: Column,
                 maxPerHost: Int): DataFrame = {
    val w = Window.partitionBy(hostCol).orderBy(order)
    // collision-safe temp name: a caller's own "host_rank" column survives
    df.withColumn("__graft_host_rank", row_number().over(w))
      .filter(col("__graft_host_rank") <= maxPerHost)
      .drop("__graft_host_rank")
  }
}
