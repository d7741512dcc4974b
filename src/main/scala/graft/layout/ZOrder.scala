package graft.layout

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout — multi-dimensional clustering for
  * min/max file skipping, the technique behind Delta/Iceberg `ZORDER BY`
  * (Morton 1966; the interleave-bits curve). Sorting 100 TB by ONE
  * column gives perfect pruning on that column and none on any other;
  * interleaving the bits of two columns and range-partitioning on the
  * result gives every file a TIGHT min/max envelope on BOTH columns, so
  * a scan filtered on either (or both) skips most files from footer
  * stats alone — no index structure, just row order.
  *
  * The interleave is the published magic-mask spread (5 shift-AND steps
  * per dimension, e.g. Bit Twiddling Hacks "Interleave bits by Binary
  * Magic Numbers") expressed as a plain Spark column chain — bitwise
  * ops only, fully inside WholeStageCodegen, no UDF. Inputs are masked
  * to 31 bits so the interleaved value fits non-negative in a signed
  * 64-bit long in every engine (DuckDB replicates the identical chain
  * with `&`/`|`/`<<` on BIGINT — gate ★ q_zorder is hash-exact).
  *
  * 100 TB: `layout` is one range-exchange on the z-value (sampled range
  * boundaries — even file sizes regardless of data skew) + an in-
  * partition sort; both spill. The z-value is 8 bytes per row. Writers
  * then emit one file per partition and ALL pruning happens at read
  * time from standard parquet min/max footers — nothing engine-specific
  * is persisted.
  */
object ZOrder {

  /** Spread the low 31 bits of `c` to the even bit positions 0,2,..,60. */
  def spread(c: Column): Column = {
    def step(x: Column, sh: Int, mask: Long): Column =
      (x.bitwiseOR(shiftleft(x, sh))).bitwiseAND(lit(mask))
    val x0 = c.cast("long").bitwiseAND(lit(0x7FFFFFFFL))
    val x1 = step(x0, 16, 0x0000FFFF0000FFFFL)
    val x2 = step(x1, 8, 0x00FF00FF00FF00FFL)
    val x3 = step(x2, 4, 0x0F0F0F0F0F0F0F0FL)
    val x4 = step(x3, 2, 0x3333333333333333L)
    step(x4, 1, 0x5555555555555555L)
  }

  /** 62-bit Morton value of (x, y): x on even bits, y on odd bits.
    * Non-negative for any input (31-bit masked), monotone in each
    * coordinate when the other is fixed. */
  def value(x: Column, y: Column): Column =
    spread(x).bitwiseOR(shiftleft(spread(y), 1)).as("zval")

  /** Cluster `df` into `numFiles` range-partitions by z-value, sorted
    * within each — write this with one file per partition and both
    * `xCol` and `yCol` get tight per-file min/max envelopes. */
  def layout(df: DataFrame, xCol: Column, yCol: Column, numFiles: Int): DataFrame = {
    val z = df.withColumn("zval", value(xCol, yCol))
    z.repartitionByRange(numFiles, col("zval"))
      .sortWithinPartitions("zval")
  }

  /** Per-partition (x, y) min/max envelopes of the CURRENT partitioning —
    * the exact statistics a parquet footer would carry per file; used to
    * measure how many files a box query must touch. */
  def envelopes(df: DataFrame, xCol: Column, yCol: Column): DataFrame =
    df.withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg(min(xCol).as("x_min"), max(xCol).as("x_max"),
        min(yCol).as("y_min"), max(yCol).as("y_max"))
}
