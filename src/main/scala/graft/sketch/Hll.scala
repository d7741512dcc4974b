package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketch (Flajolet et al. 2007), built
  * integer-exact so the driver gate needs NO float contract — the same
  * discipline as the MinHash/SimHash/PageRank oracles.
  *
  * Why a sketch at all: per-key `count(distinct v)` at 100 TB shuffles
  * every (key, v) pair; the HLL register table is a FIXED 256 rows per
  * key, mergeable across shards by register-wise max — the canonical
  * "pre-aggregate on every shard, merge tiny states" shape. (Spark's own
  * `approx_count_distinct` is HLL++ but its binary state is not
  * replicable in an external oracle; this one hashes with md5-top-64 so
  * DuckDB replays every register and the gate compares hash-exactly.)
  *
  * Layout (p = 8, m = 256): h63 = md5_top64(v) & Long.MaxValue; register
  * j = top 8 of the 63 bits (h63 >> 55); rank over the remaining 55-bit
  * window w = 56 − bitlength(w), with w = 0 → 56. All BIGINT.
  *
  * Summary (integer-exact):
  *   s_scaled  = Σ_j 2^(50−M_j)  in 2^-50 units (registers with M_j > 50
  *               contribute 0 — both engines clamp identically; a register
  *               only exceeds 50 past ~2^58 observations), absent
  *               registers contribute 2^50 each;
  *   est_milli = ⌊α_ppm·m²·2^50 / (1000·s_scaled)⌋ — the raw HLL
  *               estimate in milli-units via exact DECIMAL(38,0) division.
  * The `est` DOUBLE column adds the published small-range linear-counting
  * correction (E < 2.5m with empty registers → m·ln(m/zeros)) for users;
  * driver gates pin only the integer columns.
  */
object Hll {

  val P = 8
  val M: Int = 1 << P       // 256 registers
  val WBits = 55            // 63-bit hash: top 8 → register, low 55 → rank
  val RankCap = 50          // 2^(50−m) term clamp (m > 50 → 0)
  val AlphaPpm = 718213L    // round(1e6·α_256); α_m = 0.7213/(1 + 1.079/m)

  private def rankCol(w: Column): Column =
    when(w === 0L, lit(56)).otherwise(lit(56) - length(bin(w))).cast("int")

  /** Per-key register table `(key, j, m)` — at most [[M]] rows per key.
    * Plan: one narrow projection + ONE hash aggregate on (key, j) with
    * map-side partial max; no distinct pass needed (max is
    * duplicate-insensitive). */
  def registers(df: DataFrame, keyCol: String, valCol: String): DataFrame =
    observations(df, keyCol, valCol).groupBy("key", "j").agg(max("m").as("m"))

  /** Per-ROW observation `(key, j, m)` — the narrow pre-aggregation form
    * shared by batch [[registers]] and the streaming keyed-state fold
    * ([[graft.streaming.StreamExtract.hllDeltas]]). Works on streaming
    * DataFrames (pure expressions, no aggregate). */
  def observations(df: DataFrame, keyCol: String, valCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val h63 = graft.functions.GraftFunctions.md5Top64(col(valCol).cast("string"))
      .bitwiseAND(lit(Long.MaxValue))
    df.select(col(keyCol).cast("string").as("key"), h63.as("h63"))
      .select(col("key"),
        shiftright(col("h63"), WBits).cast("int").as("j"),
        col("h63").bitwiseAND(lit((1L << WBits) - 1)).as("w"))
      .select(col("key"), col("j"), rankCol(col("w")).as("m"))
  }

  /** Shard merge: register-wise max. `registers(a ∪ b) == merge` exactly —
    * the property that lets every shard sketch independently. */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("key", "j").agg(max("m").as("m"))

  /** `(key, present, s_scaled, est_milli, est)` per-key summary from a
    * register table. One hash aggregate; all arithmetic integer-exact
    * except the user-facing corrected `est`. */
  def summarize(regs: DataFrame): DataFrame = {
    val term = expr(
      s"CASE WHEN m <= $RankCap THEN shiftleft(CAST(1 AS BIGINT), CAST($RankCap - m AS INT)) " +
        "ELSE CAST(0 AS BIGINT) END")
    val base = regs.groupBy("key").agg(
      count(lit(1)).cast("long").as("present"),
      sum(term).as("s_present"))
    val withS = base.withColumn("s_scaled",
      col("s_present") + (lit(M.toLong) - col("present")) * lit(1L << RankCap))
    val estMilli = expr(
      s"(CAST($AlphaPpm AS DECIMAL(38,0)) * ${M.toLong * M} * ${1L << RankCap}) div " +
        "(CAST(greatest(s_scaled, 1) AS DECIMAL(38,0)) * 1000)")
    val zeros = lit(M.toLong) - col("present")
    val raw = col("est_milli").cast("double") / 1000.0
    withS
      .withColumn("est_milli", estMilli)
      .withColumn("est",
        when(raw < lit(2.5 * M) && zeros > 0,
          lit(M.toDouble) * log(lit(M.toDouble) / zeros.cast("double")))
          .otherwise(raw))
      .select("key", "present", "s_scaled", "est_milli", "est")
  }

  /** registers ∘ summarize — approximate `count(distinct valCol)` per key. */
  def estimate(df: DataFrame, keyCol: String, valCol: String): DataFrame =
    summarize(registers(df, keyCol, valCol))
}
