package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min frequency sketch (Cormode & Muthukrishnan 2005) — the
  * mergeable heavy-hitter / frequency-estimation companion to [[Hll]].
  *
  * Why at 100 TB: exact per-term counts over a web corpus shuffle the full
  * (term, cnt) domain (billions of rows); the CMS state is a FIXED
  * d×w = 4×1024 table of BIGINT counters, mergeable across shards by
  * plain addition — each executor sketches its split, the tiny states sum.
  * Estimates never undercount (est ≥ true), overcount ≤ εN with
  * probability 1−δ (ε = e/w ≈ 0.27%, δ = e^−d ≈ 1.8%).
  *
  * Determinism: row-r bucket = (md5_top64("r:" ++ v) & Long.MaxValue)
  * mod w — the engine's established oracle-replicable hash (DuckDB:
  * ('0x'||substr(md5(s),1,16))::UBIGINT), so the full sketch AND every
  * estimate replay hash-exactly in SQL. All counters BIGINT: no float
  * contract anywhere.
  */
object CountMin {

  val D = 4      // hash rows
  val W = 1024   // buckets per row

  private def bucket(r: Int, v: Column): Column =
    pmod(
      graft.functions.GraftFunctions
        .md5Top64(concat(lit(s"$r:"), v.cast("string")))
        .bitwiseAND(lit(Long.MaxValue)),
      lit(W.toLong)).cast("int")

  /** Per-ROW observation `(r, b, cnt)` — the narrow pre-aggregation form
    * shared by batch [[build]] and the streaming keyed-state fold
    * ([[graft.streaming.StreamExtract.cmsTotals]]). Works on streaming
    * DataFrames (pure expressions, no aggregate). */
  def observations(df: DataFrame, valCol: String, weight: Column = lit(1L)): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val rows = (0 until D).map(r =>
      struct(lit(r).as("r"), bucket(r, col(valCol)).as("b")))
    df.select(explode(array(rows: _*)).as("rb"), weight.as("cnt"))
      .select(col("rb.r").as("r"), col("rb.b").as("b"), col("cnt"))
  }

  /** Build the d×w sketch over `valCol` with per-row weight `weightCol`
    * (pass `lit(1L)` for plain counting). Plan: one narrow 4× explode +
    * ONE hash aggregate on (r, b) with map-side partials — the output is
    * at most d·w = 4096 rows regardless of input size. */
  def build(df: DataFrame, valCol: String, weight: Column = lit(1L)): DataFrame =
    observations(df, valCol, weight).groupBy("r", "b").agg(sum("cnt").as("c"))

  /** Shard merge: counter-wise sum — `build(a ∪ b) == merge` exactly. */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("r", "b").agg(sum("c").as("c"))

  /** Point estimates for the values in `queries(valCol)`:
    * est = min over the d rows of the addressed counter (absent counter →
    * 0). Plan: 4× explode of the QUERY side (small), one equi-join against
    * the ≤4096-row sketch (broadcast), one min-aggregate per value. */
  def estimate(sketch: DataFrame, queries: DataFrame, valCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(queries.sparkSession)
    val rows = (0 until D).map(r =>
      struct(lit(r).as("r"), bucket(r, col(valCol)).as("b")))
    queries
      .select(col(valCol).as("v"), explode(array(rows: _*)).as("rb"))
      .select(col("v"), col("rb.r").as("r"), col("rb.b").as("b"))
      .join(broadcast(sketch), Seq("r", "b"), "left")
      .groupBy("v")
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
  }
}
