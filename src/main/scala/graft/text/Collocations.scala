package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Collocation mining — corpus-level word-association scores over
  * consecutive token pairs (Church & Hanks 1990's association-ratio
  * family). Classic corpus analytics: which bigrams occur together far
  * more than independence predicts (collocations, named entities,
  * multi-word terms) — the statistics behind phrase-table induction and
  * tokenizer-merge diagnostics.
  *
  * Score: LIFT = P(ab) / (P(a)·P(b)) = cnt_ab·N / (cnt_a·cnt_b) — PMI
  * without the log, same ranking (log is monotone). Kept log-free on
  * purpose: every factor is an exact integer, double products of counts
  * are exact below 2^53, and the single division is IEEE-correctly
  * rounded — the score is bit-identical cross-engine with no float
  * contract (quantize-once; a log-based PMI would need an ulp clause).
  *
  * Plan shape: bigrams are built WITHIN each document by zipping the
  * token array with its own tail (one narrow explode — consecutive
  * pairs never cross documents, so no self-join); then two count
  * aggregates (bigram, unigram) and two joins keyed on the word. The
  * min-support filter runs BEFORE the joins — at 100 TB the bigram tail
  * is the bulk of the data and dies on the map side of its own count;
  * only surviving candidates pay join cost. Top-k is a
  * TakeOrderedAndProject (never a global sort).
  */
object Collocations {

  /** Top-`k` collocations by lift among bigrams with support ≥ `minCount`.
    * Emits (a, b, cnt_ab, lift) ordered by (lift DESC, a, b). */
  def topLift(docs: DataFrame, textCol: String, minCount: Long, k: Int): DataFrame = {
    require(minCount >= 1 && k >= 1, "minCount and k must be positive")
    val toks = docs.select(split(lower(col(textCol)), "\\s+").as("ts"))
      .filter(size(col("ts")) >= 2)
    val big = toks.select(explode(expr(
        "transform(sequence(0, size(ts)-2), i -> named_struct('a', ts[i], 'b', ts[i+1]))")).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    val uni = toks.select(explode(col("ts")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    val cb = big.groupBy("a", "b").agg(count(lit(1)).as("cnt_ab"))
      .filter(col("cnt_ab") >= minCount)
    // the bigram-position total: one scalar, rides a 1-row cross join
    val n = big.agg(count(lit(1)).as("nb"))
    cb.join(uni.withColumnRenamed("w", "a").withColumnRenamed("cnt", "cnt_a"), "a")
      .join(uni.withColumnRenamed("w", "b").withColumnRenamed("cnt", "cnt_b"), "b")
      .crossJoin(broadcast(n))
      .select(col("a"), col("b"), col("cnt_ab"),
        round(col("cnt_ab").cast("double") * col("nb")
          / (col("cnt_a").cast("double") * col("cnt_b")), 6).as("lift"))
      .orderBy(desc("lift"), asc("a"), asc("b"))
      .limit(k)
  }
}
