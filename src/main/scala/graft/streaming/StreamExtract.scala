package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode, Trigger}
import graft.PageRow
import graft.extract.Extract
import graft.chunk.Chunker

/** Structured Streaming surfaces.
  *
  * The reference is strictly batch-with-resume (SURVEY.md §2.9) — its
  * incremental machinery maps to the lake layer's snapshot anti-join, run as
  * `Trigger.AvailableNow` micro-batch. These entry points cover the
  * streaming shape for continuous ingest of the same pipeline:
  *
  *  - `extractStream`: pages stream → the identical extraction/chunk logic
  *    (same code path as batch — one pipeline, two triggers);
  *  - `eventCounts`: event-time windowed aggregation with a watermark over
  *    the `events` table schema (ts, event_type, value).
  */
object StreamExtract {

  /** Streaming extraction: same typed stages as the batch job. Works on any
    * streaming Dataset[PageRow] source (file source over the pages table
    * directory, or MemoryStream in tests). */
  def extractStream(pages: Dataset[PageRow])(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val docs = pages.mapPartitions(_.map(p => Extract.extractOne(p.url, p.html)))
    docs.flatMap { d =>
      if (d.err.isEmpty && d.text.nonEmpty)
        Chunker.chunkDocument(d.url, graft.Hashing.sha256Hex(d.text), d.text)
      else Nil
    }.toDF()
  }

  /** Event-time tumbling-window counts with a watermark (late data beyond
    * 10 minutes dropped; state bounded — the 100-TB-stream shape). */
  def eventCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("total"))
      .select(col("window.start").as("win_start"), col("event_type"), col("cnt"), col("total"))

  /** Streaming exact dedup with lineage — the streaming form of
    * `ExactDedup.annotate`: keep the first document per content hash
    * ACROSS micro-batches via keyed state, annotating every later arrival
    * with `is_duplicate` and the keeper's url (the same dropped-lineage
    * shape `DedupJob` persists in batch).
    *
    * Keyed state is one url per distinct content — bounded by distinct
    * corpus contents, not stream length; rows shuffle once on the content
    * hash (high-cardinality, uniform by construction). Within a batch the
    * keeper is the lexicographically smallest url (matching batch
    * keep-first determinism); across batches the earlier batch wins. For
    * streams where state must be evicted, compose `withWatermark` +
    * `dropDuplicatesWithinWatermark` instead and give up the lineage
    * column. */
  def dedupStream(docs: Dataset[(String, String)])(
      implicit spark: SparkSession): Dataset[(String, Boolean, String)] = {
    import spark.implicits._
    docs
      .map { case (url, text) => (graft.Hashing.sha256Hex(text), url) }
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String, rows: Iterator[(String, String)], state: GroupState[String]) => {
          // exactly ONE non-duplicate emission per content, ever: the first
          // sorted url of the first batch. Every other row — including a
          // redelivered copy of the keeper url itself — annotates as a
          // duplicate, mirroring batch ExactDedup.annotate's row_number>1.
          val urls = rows.map(_._2).toVector.sorted
          val existing = state.getOption
          val keeper = existing.getOrElse { state.update(urls.head); urls.head }
          val out =
            if (existing.isEmpty) (urls.head, false, keeper) +: urls.tail.map(u => (u, true, keeper))
            else urls.map(u => (u, true, keeper))
          out.iterator
        })
  }

  /** Batch-over-table incremental run: `Trigger.AvailableNow` drains the
    * pages directory once and stops — the streaming-native equivalent of the
    * reference's resume loop (checkpointed source offsets replace the
    * progress ledger). */
  def availableNowWriter(chunks: DataFrame, outDir: String, checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    chunks.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
}
