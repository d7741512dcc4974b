package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-corpus PARAGRAPH dedup — the CCNet-style boilerplate-removal pass
  * of LLM data pipelines (published in "CCNet: Extracting High Quality
  * Monolingual Datasets from Web Crawl Data", Wenzek et al., LREC 2020):
  * a paragraph that already appeared anywhere earlier in the corpus
  * (cookie banners, footers, nav boilerplate repeated across a site) is
  * removed from every later document, keep-first in global
  * (doc id, paragraph index) order.
  *
  * Whole plan is built-ins: split/trim/posexplode (narrow) → one window
  * shuffle keyed on `(md5_top64(para), para)` — hash FIRST so the exchange
  * partitioner and the within-partition sort compare 8-byte longs before
  * ever touching the arbitrary-length paragraph string; the full text stays
  * in the key as a collision tiebreaker, so exactness is unchanged. The
  * window only ranks and keeps rank 1 (a WindowGroupLimit-able shape, not
  * an aggregation buffer) → one groupBy(doc) reassembly. Two shuffles
  * total, no UDFs (md5_top64 is a codegen'd native expression).
  */
object ParagraphDedup {

  /** (id, clean_text): each document's text with every
    * previously-seen-in-corpus paragraph removed; a document whose every
    * paragraph was seen before collapses to the empty string (it was pure
    * boilerplate — the row survives for lineage). */
  def clean(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val segs = filter(
      transform(split(col(textCol), "\\n\\s*\\n"), p => trim(p)),
      p => length(p) > 0)
    val paras = df
      .select(col(idCol).cast("string").as("id"), posexplode(segs).as(Seq("idx", "para")))
      .withColumn("ph", graft.functions.GraftFunctions.md5Top64(col("para")))
    val w = Window.partitionBy("ph", "para").orderBy("id", "idx")
    val kept = paras
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    val rebuilt = kept.groupBy("id")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("idx"), col("para")))),
          s => s.getField("para")),
        "\n\n").as("clean_text"))
    df.select(col(idCol).cast("string").as("id"))
      .join(rebuilt, Seq("id"), "left")
      .withColumn("clean_text", coalesce(col("clean_text"), lit("")))
  }
}
