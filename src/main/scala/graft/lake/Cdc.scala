package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot change-data capture — the crawl-N vs crawl-N+1 diff every
  * recurring 100-TB corpus build starts from: which documents appeared,
  * which changed, which vanished. Downstream stages (re-extraction,
  * re-indexing, re-embedding) then touch ONLY the changed slice instead
  * of the full corpus — the batch analog of the lake's keyed resume.
  *
  * Implementation: one FULL OUTER join on the id columns; op is decided
  * by side presence (`insert` / `delete`) or, when both sides exist, by
  * null-safe inequality over the compare columns (`update`); unchanged
  * rows are filtered out. Comparison is exact column equality (`<=>`),
  * not a hash — no collision caveat, and the DuckDB oracle replays it
  * verbatim with IS NOT DISTINCT FROM.
  *
  * Scale: one shuffle per side keyed on the id (unique → skew-free), then
  * a narrow compare; AQE handles the empty/changed-slice extremes. When
  * both snapshots are written co-bucketed on the id ([[graft.layout
  * .Bucketed]]), the join consumes the on-disk layout and the whole diff
  * plans with ZERO exchanges — CdcSpec pins that composition. Works
  * directly over [[LakeTable.readAt]] pairs for committed-snapshot diffs.
  */
object Cdc {

  /** Diff `oldDf` → `newDf`: one row per changed id —
    * (idCols..., op ∈ insert|update|delete). Ids must be unique per side
    * and NON-NULL (side presence is read off the joined id's nullness). */
  def diff(oldDf: DataFrame, newDf: DataFrame,
           idCols: Seq[String], compareCols: Seq[String]): DataFrame = {
    require(idCols.nonEmpty && compareCols.nonEmpty, "empty column lists")
    val l = oldDf.select((idCols ++ compareCols).map(col): _*).alias("o")
    val r = newDf.select((idCols ++ compareCols).map(col): _*).alias("n")
    // plain equality (ids are non-null by contract): === keys let a
    // co-bucketed layout satisfy the join's distribution — <=> would
    // wrap the keys and forfeit the zero-Exchange plan
    val on = idCols.map(c => col(s"o.$c") === col(s"n.$c")).reduce(_ && _)
    val changed = compareCols
      .map(c => !(col(s"o.$c") <=> col(s"n.$c"))).reduce(_ || _)
    val oldPresent = idCols.map(c => col(s"o.$c").isNotNull).reduce(_ && _)
    val newPresent = idCols.map(c => col(s"n.$c").isNotNull).reduce(_ && _)
    l.join(r, on, "full_outer")
      .withColumn("op",
        when(!oldPresent, lit("insert"))
          .when(!newPresent, lit("delete"))
          .when(changed, lit("update")))
      .filter(col("op").isNotNull)
      .select(idCols.map(c => coalesce(col(s"o.$c"), col(s"n.$c")).as(c))
        :+ col("op"): _*)
  }
}
