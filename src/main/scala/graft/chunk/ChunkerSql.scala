package graft.chunk

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Catalyst-native chunking — the north star's "sliding-window segmentation
  * via a window over span rows" — built entirely from split/posexplode/
  * window/sha1 expressions (no Scala closures, fully codegen'd + one window
  * shuffle).
  *
  * Semantics per reference chunking.py:
  *  - K1 split: `\r\n?`→`\n`, split on `\n\s*\n`, trim, drop empties
  *    (posexplode over the span rows)
  *  - K3 overlap: previous span's last 80 chars trimmed forward to a word
  *    boundary, prepended with one space (`lag` over
  *    Window.partitionBy(url).orderBy(idx))
  *  - K4 enumeration: row_number / count over the same window
  *  - K5 ids: sha1("{doc_hash}:{idx}:{chunk_hash}")
  *
  * The greedy K2 size-band merge is inherently a sequential per-document
  * fold (no Catalyst scan primitive) and stays in [[Chunker]]; this
  * operator is the paragraph-granularity variant — exactly equal to
  * [[Chunker.chunkDocument]] whenever no merge fires (every paragraph
  * already ≥ min chars), which the spec asserts.
  */
object ChunkerSql {

  /** Sliding-window sentence segmentation — the north star's phrase made
    * literal: sentences become span rows (posexplode), each window of
    * `windowSize` consecutive sentences starting every `stride` sentences
    * becomes one segment, assembled with `collect_list` over a frame-bounded
    * window. Pure expressions + one window shuffle; no UDF, no fold.
    *
    * Sentence boundary: split after [.!?] runs followed by whitespace
    * (punctuation kept with its sentence). */
  def slidingSentences(df: DataFrame, urlCol: String, textCol: String,
                       windowSize: Int = 3, stride: Int = 2): DataFrame = {
    require(windowSize >= 1 && stride >= 1)
    val sentences = df.select(
        col(urlCol).as("url"),
        posexplode(
          filter(
            transform(split(col(textCol), "(?<=[.!?])\\s+"), s => trim(s)),
            s => length(s) > 0)).as(Seq("sent_idx", "sentence")))

    val w = Window.partitionBy("url").orderBy("sent_idx")
      .rowsBetween(Window.currentRow, windowSize - 1)
    val wAll = Window.partitionBy("url")
    sentences
      .withColumn("n_sents", count(lit(1)).over(wAll))
      .withColumn("window_sents", collect_list(col("sentence")).over(w))
      // a window starts at every stride-th sentence; the last full window
      // (or a shorter tail when fewer sentences remain) is kept
      .filter(col("sent_idx") % stride === 0)
      .withColumn("text", concat_ws(" ", col("window_sents")))
      .withColumn("segment_index", (col("sent_idx") / stride).cast("int"))
      .select(col("url"), col("segment_index"), col("sent_idx").as("start_sentence"),
        size(col("window_sents")).as("n_sentences"), col("text"))
  }

  /** Input: (urlCol, docHashCol, textCol). Output: url, chunk_index,
    * total_chunks, text, chunk_hash, id — one row per paragraph chunk. */
  def chunkParagraphs(df: DataFrame, urlCol: String, docHashCol: String, textCol: String): DataFrame = {
    val spans = df.select(
        col(urlCol).as("url"), col(docHashCol).as("doc_hash"),
        posexplode(
          filter(
            transform(
              split(regexp_replace(col(textCol), "\\r\\n?", "\n"), "\n\\s*\n"),
              p => trim(p)),
            p => length(p) > 0)).as(Seq("para_idx", "para")))

    val w = Window.partitionBy("url").orderBy("para_idx")
    val overlapped = spans
      .withColumn("prev", lag(col("para"), 1).over(w))
      // K3, reference chunking.py:36-39 verbatim: tail = last 80 chars of
      // prev; iff the first space sits at index > 0 (instr > 1), cut forward
      // past it; join tail + " " + para unconditionally — no trim
      .withColumn("tail0", when(col("prev").isNull, lit(""))
        .when(length(col("prev")) <= Chunker.OverlapChars, col("prev"))
        .otherwise(substring(col("prev"), -Chunker.OverlapChars, Chunker.OverlapChars)))
      .withColumn("tail", when(instr(col("tail0"), " ") > 1,
          expr(s"substring(tail0, instr(tail0, ' ') + 1)"))
        .otherwise(col("tail0")))
      .withColumn("text", when(col("prev").isNull, col("para"))
        .otherwise(concat(col("tail"), lit(" "), col("para"))))

    val wAll = Window.partitionBy("url")
    overlapped
      .withColumn("chunk_index", (row_number().over(w) - 1).cast("int"))
      .withColumn("total_chunks", count(lit(1)).over(wAll).cast("int"))
      .withColumn("chunk_hash", sha1(col("text").cast("binary")))
      .withColumn("id", sha1(concat_ws(":", col("doc_hash"), col("chunk_index"), col("chunk_hash")).cast("binary")))
      .select("url", "chunk_index", "total_chunks", "text", "chunk_hash", "id")
  }
}
