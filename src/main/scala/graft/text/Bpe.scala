package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) vocabulary learning — the tokenizer
  * TRAINING step of a pretraining pipeline (Sennrich et al. 2016, published
  * algorithm; the merge-table form used by GPT-2/SentencePiece-BPE).
  *
  * Scale shape: everything iterates over the WORD-FREQUENCY table
  * (vocabulary-sized — orders of magnitude below corpus scale; the one
  * corpus-sized pass is the initial word count). Each merge round is
  *   flatMap adjacent symbol pairs (narrow) → hash aggregate weighted by
  *   word freq (map-side partial) → argmax via orderBy+limit(1)
  *   (TakeOrderedAndProject, one bounded 1-row collect per round — the
  *   same pattern as IVF centroid training) → narrow map applying the
  *   merge.
  * The word Dataset is localCheckpoint'ed every round: k self-referencing
  * iterations would otherwise grow an exponential logical plan (the
  * pointer-jumping CC lesson).
  *
  * Merging is the canonical greedy left-to-right non-overlapping scan; ties
  * in pair frequency break to the lexicographically smaller "A B" pair
  * string, so the whole learn run is deterministic and oracle-replicable.
  */
object Bpe extends Serializable {

  /** (word, freq) over the shared lowercase-alphanumeric tokenizer. */
  def wordFreqs(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(graft.index.Bm25.tokensCol(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Greedy left-to-right application of one merge (a, b) → a+b. */
  def applyMerge(syms: Seq[String], a: String, b: String): Seq[String] = {
    val in = syms.toIndexedSeq
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < in.length) {
      if (i + 1 < in.length && in(i) == a && in(i + 1) == b) { out += a + b; i += 2 }
      else { out += in(i); i += 1 }
    }
    out.toSeq
  }

  /** Learn `nMerges` merge rules from a (word, freq) table.
    * @return (merge ledger (step, pair, cnt) — k driver rows, and the
    *         final symbolized vocabulary (word, syms)) */
  def learn(spark: SparkSession, words: DataFrame, nMerges: Int): (DataFrame, DataFrame) = {
    import spark.implicits._
    var cur = words.select(col("word").cast("string"), col("freq").cast("long"))
      .as[(String, Long)]
      .map { case (w, f) => (w, w.map(_.toString): Seq[String], f) }
      .localCheckpoint()
    val ledger = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= nMerges && !exhausted) {
      val best = cur.flatMap { case (_, syms, f) =>
        if (syms.length < 2) Iterator.empty
        else syms.sliding(2).map(p => (p(0) + " " + p(1), f))
      }.toDF("pair", "f")
        .groupBy("pair").agg(sum("f").as("cnt"))
        .orderBy(desc("cnt"), asc("pair")).limit(1)
        .collect()
      if (best.isEmpty) exhausted = true
      else {
        val pair = best(0).getString(0)
        val cnt = best(0).getLong(1)
        ledger += ((step, pair, cnt))
        val Array(a, b) = pair.split(" ", 2)
        cur = cur.map { case (w, syms, f) => (w, applyMerge(syms, a, b), f) }
          .localCheckpoint()
        step += 1
      }
    }
    (ledger.toSeq.toDF("step", "pair", "cnt"),
      cur.map { case (w, syms, _) => (w, syms.mkString(" ")) }.toDF("word", "syms"))
  }
}
