package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Anchor-text aggregation — the web-graph TEXT signal: the anchors of a
  * page's in-links summarize what the web calls it (the classic retrieval
  * feature since Brin & Page 1998 §2.2, and a document-quality/label
  * signal in web-corpus pipelines). Given the link table (src, dst,
  * anchor), produce per TARGET the top-`cap` distinct anchor strings by
  * in-link count with exact totals — capped, because popular pages have
  * unbounded in-degree and an uncapped anchor list is the classic
  * hot-key OOM.
  *
  * Determinism: ties break to the lexicographically smaller anchor; the
  * kept list concatenates in (count desc, anchor asc) order — string and
  * integer output only, no float contract.
  *
  * Plan shape at web scale: the (dst, anchor) count aggregate is the
  * big reduction — map-side partials absorb the per-page repetition of
  * boilerplate anchors, so a page with 10^8 in-links ships its DISTINCT
  * anchor counts, not its links. The rank window and the final per-dst
  * aggregate both key on dst and reuse that one exchange. The window
  * deliberately does NOT pre-cap via WindowGroupLimit: `n_links` /
  * `n_anchors` are exact pre-cap totals, so every (dst, anchor, cnt) row
  * must reach the aggregate (the round-4 lesson in reverse — the rewrite
  * is only correct when nothing downstream needs the dropped rows); the
  * cap bounds the OUTPUT string, and the row domain is already the
  * distinct-anchor table, not the raw link table.
  */
object AnchorText {

  /** (dst, n_links, n_anchors, kept) — `n_links` total in-links,
    * `n_anchors` distinct anchor strings (pre-cap, exact), `kept` the
    * top-`cap` anchors as "anchor:count" joined with " | ". */
  def aggregate(edges: DataFrame, cap: Int = 8): DataFrame = {
    val counts = edges.groupBy("dst", "anchor")
      .agg(count(lit(1)).as("cnt"))
    val byCount = Window.partitionBy("dst")
      .orderBy(desc("cnt"), asc("anchor"))
    counts
      .withColumn("rn", row_number().over(byCount))
      .groupBy("dst")
      .agg(sum("cnt").as("n_links"),
        count(lit(1)).as("n_anchors"),
        concat_ws(" | ",
          sort_array(collect_list(when(col("rn") <= cap,
            struct(col("rn"), concat(col("anchor"), lit(":"), col("cnt")).as("s")))))
            .getField("s")).as("kept"))
  }
}
