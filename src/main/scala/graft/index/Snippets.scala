package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** KWIC snippet generation — the passage-highlight step every retrieval
  * stack puts between ranked doc ids and human eyes (the auto-extract
  * family of Luhn, IBM J. 1958: pick the span with the densest query-term
  * coverage). For each document, the width-`width` token window containing
  * the MOST query-term occurrences wins; ties go to the earliest window —
  * a total deterministic order with INTEGER scoring only, so the gate
  * needs no float contract.
  *
  * Contract: tokens are the [[Bm25]] convention (lowercase alnum runs) and
  * the emitted snippet is the space-joined normalized window (offsets into
  * raw text would re-open the un-normalization problem; callers needing
  * raw spans compose with [[graft.model]] Span extraction instead). Docs
  * with zero query-term hits emit nothing.
  *
  * Plan shape: ONE narrow typed map per doc (prefix-summed hit counts,
  * O(n) per doc), zero shuffles — and the operator contractually runs on a
  * RETRIEVED top-k relation (bounded by k · query count), never the raw
  * corpus, so per-row work is the whole cost. */
object Snippets {

  /** (doc, win_start, hits, snippet) per doc with ≥ 1 query-term hit;
    * win_start is the 1-based token position of the winning window. */
  def of(docs: DataFrame, idCol: String, textCol: String, query: String,
         width: Int): DataFrame = {
    require(width >= 1, s"width $width")
    val spark = docs.sparkSession
    import spark.implicits._
    val qset = graft.dedup.MinHash.tokenize(query).toSet
    val w = width
    docs.select(col(idCol).cast("string").as("doc"),
        coalesce(col(textCol).cast("string"), lit("")).as("text"))
      .as[(String, String)]
      .flatMap { case (id, text) =>
        val toks = graft.dedup.MinHash.tokenize(text)
        val n = toks.length
        if (n == 0) Iterator.empty
        else {
          val pre = new Array[Int](n + 1)
          var i = 0
          while (i < n) {
            pre(i + 1) = pre(i) + (if (qset(toks(i))) 1 else 0)
            i += 1
          }
          val nWindows = math.max(1, n - w + 1)
          var best = -1
          var bestStart = 0
          var s = 0
          while (s < nWindows) {
            val hits = pre(math.min(s + w, n)) - pre(s)
            if (hits > best) { best = hits; bestStart = s }
            s += 1
          }
          if (best <= 0) Iterator.empty
          else Iterator.single((id, bestStart + 1L, best.toLong,
            toks.slice(bestStart, math.min(bestStart + w, n)).mkString(" ")))
        }
      }.toDF("doc", "win_start", "hits", "snippet")
  }
}
