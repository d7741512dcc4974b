package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document quality filtering — the rule-gate step of published LLM data
  * pipelines (Gopher Table A1 / Dolma / FineWeb): every document is
  * annotated keep/drop with the NAMES of the rules it failed, so drops are
  * ledgered with reasons (the same never-silent discipline as the LSH cap
  * counters and the dedup dropped relation).
  *
  * Rules (thresholds are constructor-style parameters, defaults in the
  * published ballpark):
  *   too_few_words            ws-token count < minWords
  *   too_many_words           ws-token count > maxWords
  *   too_repetitive_lines     duplicate-line fraction > maxDupLineFrac
  *   too_repetitive_5grams    duplicate-5-gram fraction > maxDup5Frac
  *   dominant_word            top-word fraction > maxTopWordFrac
  *
  * Plan shape: ONE narrow typed map per doc (token count + repetition
  * ratios in the same pass), zero shuffles — embarrassingly parallel at
  * any corpus size. Reasons are emitted in fixed rule order as a
  * comma-joined string (oracle-friendly; empty string == keep).
  */
object QualityFilter {

  final case class Thresholds(
      minWords: Int = 20,
      maxWords: Int = 100000,
      maxDupLineFrac: Double = 0.05,
      maxDup5Frac: Double = 0.15,
      maxTopWordFrac: Double = 0.2)

  /** (id, keep, reasons) per document. Ids stay STRINGS like every sibling
    * operator (DedupJob/IndexJob/Knn) — url- or chunk-keyed relations
    * (`doc://5#0`) pass through unchanged; numeric callers cast the output.
    * Null text is treated as empty (gated by too_few_words, not a crash). */
  def annotate(spark: SparkSession, docs: DataFrame, idCol: String, textCol: String,
               t: Thresholds = Thresholds()): DataFrame = {
    import spark.implicits._
    val th = t // local copy — the closure must not capture `this`
    docs.select(col(idCol).cast("string").as("id"),
        coalesce(col(textCol).cast("string"), lit("")).as("text"))
      .as[(String, String)]
      .map { case (id, text) =>
        val ws = text.split("\\s+").count(_.nonEmpty)
        val (dl, d5, tw) = TextAnalysis.repetitionRatios(text)
        val reasons = Seq(
          if (ws < th.minWords) "too_few_words" else null,
          if (ws > th.maxWords) "too_many_words" else null,
          if (dl > th.maxDupLineFrac) "too_repetitive_lines" else null,
          if (d5 > th.maxDup5Frac) "too_repetitive_5grams" else null,
          if (tw > th.maxTopWordFrac) "dominant_word" else null
        ).filter(_ != null).mkString(",")
        (id, reasons.isEmpty, reasons)
      }.toDF("doc_id", "keep", "reasons")
  }
}
