package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** C4-style line-level page cleaning — the published heuristics of Raffel
  * et al. 2020 ("Exploring the Limits of Transfer Learning", §2.2 — public
  * knowledge), the step web-scale pipelines run between extraction and the
  * document-level quality gate ([[QualityFilter]] operates on whole docs;
  * this operator cleans WITHIN a doc and verdicts the page):
  *
  * Line rules (a line survives iff ALL hold, evaluated on the trimmed line):
  *   - ends in a terminal punctuation mark (`. ! ? "`)
  *   - has at least `minWordsPerLine` whitespace-words
  *   - contains none of `badLineTokens` (case-insensitive; C4's canonical
  *     example is boilerplate "javascript" warnings)
  * Page rules (the whole document is dropped iff ANY holds):
  *   - fewer than `minKeptLines` lines survive (C4's 3-sentence floor,
  *     expressed at line granularity — our unit of cleaning)
  *   - the raw page contains any of `badPageTokens` (case-insensitive;
  *     C4 drops "lorem ipsum" placeholder pages and source code via `{`)
  *
  * C4's dirty-word-list page rule is omitted (no public list ships here);
  * `badPageTokens` is the extension point a deployment would load one into.
  *
  * Output is never-silent, like every gate in this engine: dropped pages
  * keep their row (`page_keep = false`) and per-doc kept/dropped line
  * counts make the cleaning auditable without a second pass.
  *
  * Plan shape: ONE narrow typed map per document (split → filter → rejoin
  * in a single pass), zero shuffles — embarrassingly parallel at any
  * corpus size, and pipeline-fusable with the extraction pass that
  * produced the text.
  */
object C4Clean {

  final case class Params(
      minWordsPerLine: Int = 5,
      minKeptLines: Int = 3,
      badLineTokens: Seq[String] = Seq("javascript"),
      badPageTokens: Seq[String] = Seq("lorem ipsum", "{"))

  private val Terminal = Set('.', '!', '?', '"')

  /** (doc_id, page_keep, n_kept, n_dropped, cleaned) per document. Ids stay
    * STRINGS like every sibling operator; numeric callers cast the output.
    * Null text is treated as empty (0 lines → page dropped, not a crash).
    * Blank lines are not counted as dropped — they are structure, not
    * content (the paragraph chunker owns them). */
  def clean(spark: SparkSession, docs: DataFrame, idCol: String, textCol: String,
            p: Params = Params()): DataFrame = {
    import spark.implicits._
    val pp = p // local copy — the closure must not capture this object
    docs.select(col(idCol).cast("string").as("id"),
        coalesce(col(textCol).cast("string"), lit("")).as("text"))
      .as[(String, String)]
      .map { case (id, text) =>
        val lines = text.split("\n", -1).map(_.trim).filter(_.nonEmpty)
        val kept = lines.filter { l =>
          Terminal.contains(l.last) &&
            l.split("\\s+").count(_.nonEmpty) >= pp.minWordsPerLine && {
              val ll = l.toLowerCase
              !pp.badLineTokens.exists(ll.contains(_))
            }
        }
        val lower = text.toLowerCase
        val pageKeep = kept.length >= pp.minKeptLines &&
          !pp.badPageTokens.exists(lower.contains(_))
        (id, pageKeep, kept.length, lines.length - kept.length,
          kept.mkString("\n"))
      }.toDF("doc_id", "page_keep", "n_kept", "n_dropped", "cleaned")
  }
}
