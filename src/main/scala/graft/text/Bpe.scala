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
  def learn(spark: SparkSession, words: DataFrame, nMerges: Int,
            driverWordLimit: Long = 1L << 18): (DataFrame, DataFrame) = {
    import spark.implicits._
    var cur = words.select(col("word").cast("string"), col("freq").cast("long"))
      .as[(String, Long)]
      .map { case (w, f) => (w, w.map(_.toString): Seq[String], f) }
      .localCheckpoint()
    // size-gated driver rounds (the graph-family driverLoop precedent):
    // the merge loop iterates the VOCABULARY table, so when it fits under
    // `driverWordLimit` rows the k rounds run in driver memory — identical
    // pair counting (integer sums are order-free), the identical
    // (cnt DESC, pair ASC) argmax (pairs are ASCII, so Java string order
    // == the UTF8 binary order Spark sorts by), and the SAME shared
    // applyMerge scan. Open-web vocabularies beyond the gate run the
    // distributed rounds below (BpeSpec pins path parity).
    if (cur.count() <= driverWordLimit)
      return driverLearn(spark, cur.collect(), nMerges)
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

  /** Driver replica of the merge rounds over a collected vocabulary. */
  private def driverLearn(spark: SparkSession,
                          vocab0: Array[(String, Seq[String], Long)],
                          nMerges: Int): (DataFrame, DataFrame) = {
    import spark.implicits._
    var vocab = vocab0
    val ledger = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= nMerges && !exhausted) {
      val cnt = scala.collection.mutable.HashMap.empty[String, Long]
      vocab.foreach { case (_, syms, f) =>
        if (syms.length >= 2)
          syms.sliding(2).foreach(p =>
            cnt.update(p(0) + " " + p(1), cnt.getOrElse(p(0) + " " + p(1), 0L) + f))
      }
      if (cnt.isEmpty) exhausted = true
      else {
        val (pair, c) = cnt.minBy { case (p, n) => (-n, p) }
        ledger += ((step, pair, c))
        val Array(a, b) = pair.split(" ", 2)
        vocab = vocab.map { case (w, syms, f) => (w, applyMerge(syms, a, b), f) }
        step += 1
      }
    }
    (ledger.toSeq.toDF("step", "pair", "cnt"),
      vocab.toSeq.map { case (w, syms, _) => (w, syms.mkString(" ")) }.toDF("word", "syms"))
  }

  /** ENCODE a corpus with a learned merge ledger — the inference half of
    * the tokenizer (the per-word merge loop GPT-2/SentencePiece run at
    * encode time): each word starts as characters and the merges apply
    * sequentially in learned step order, the same greedy left-to-right
    * scan as training — so encoding the training corpus reproduces
    * `learn`'s final symbolization exactly, and unseen words still encode
    * deterministically.
    *
    * Scale shape: ONE corpus-sized tokenize (`Bm25.termFreq`, map-side
    * partial agg); the merge loop itself runs only over DISTINCT words
    * (vocabulary-sized, narrow map — the ledger is k driver rows captured
    * in the closure); token totals come back via a word-keyed join (AQE
    * broadcasts the vocab side when small) and one per-doc aggregation.
    * No per-document merge work ever happens: a word seen 10^9 times is
    * encoded once.
    *
    * @param merges (a, b) pairs in learned order (step ascending)
    * @return (doc, n_tokens, n_words): BPE token count and raw word count
    *         per document — the real token accounting a training-data
    *         pipeline bills by. */
  def encode(spark: SparkSession, docs: DataFrame, idCol: String,
             textCol: String, merges: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    val tf = graft.index.Bm25.termFreq(docs.filter(col(idCol).isNotNull), idCol, textCol)
    val m = merges.toIndexedSeq
    val enc = tf.select(col("term")).distinct().as[String].map { w =>
      var syms: Seq[String] = w.map(_.toString)
      m.foreach { case (a, b) => syms = applyMerge(syms, a, b) }
      (w, syms.length.toLong)
    }.toDF("term", "n_syms")
    tf.join(enc, "term")
      .groupBy("doc")
      .agg(sum(col("tf") * col("n_syms")).cast("long").as("n_tokens"),
        sum("tf").cast("long").as("n_words"))
  }
}
