package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Spelling suggestion over the corpus's own vocabulary — the retrieval
  * engine's "did you mean" stage, built the SymSpell way (Garbe's
  * symmetric-delete algorithm, public knowledge): candidate pairs come
  * from a JOIN on single-character-deletion keys, never from a vocab ×
  * query edit-distance cross product. For edit distance ≤ 1 the deletion
  * neighborhoods of two words intersect iff the words are within
  * distance 1 (equal / one insertion / one deletion / one substitution
  * all share a common deletion form), so the key join finds EXACTLY the
  * brute-force candidate set; an explicit `levenshtein` re-check keeps
  * the operator defensively exact rather than proof-dependent.
  *
  * All integer/string arithmetic — no float contract. Suggestions rank
  * by (corpus frequency DESC, term) per query term, cut with a
  * `row_number ≤ k` window (WindowGroupLimit — map-side truncation).
  *
  * At 100 TB the deletion explode is VOCAB-bounded (≈ (len+1)·|vocab|
  * keys), not corpus-bounded; the query side is a handful of broadcast
  * rows; compose with top-V vocabulary induction ([[Vocab.top]]) to
  * bound an open-web vocabulary first. */
object Spell {

  /** Deletion-neighborhood keys (distance ≤ 1) of a string column: the
    * string itself plus each single-character deletion. */
  private def delKeys(c: String): org.apache.spark.sql.Column = expr(
    s"array_distinct(concat(array($c), transform(sequence(0, length($c)-1), " +
      s"i -> concat(substring($c, 1, i), substring($c, i+2, length($c))))))")

  /** Up to `k` suggestions per query term: (qterm, rank, term, cnt). */
  def suggest(docs: DataFrame, textCol: String, query: String, k: Int = 3): DataFrame = {
    require(k >= 1, s"k $k")
    val spark = docs.sparkSession
    import spark.implicits._
    val vocab = docs.select(explode(graft.index.Bm25.tokensCol(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
    val vkeys = vocab.select(col("term"), col("cnt"), explode(delKeys("term")).as("key"))
    val qkeys = graft.dedup.MinHash.tokenize(query).distinct.toSeq.toDF("qterm")
      .select(col("qterm"), explode(delKeys("qterm")).as("key"))
    val w = Window.partitionBy("qterm").orderBy(desc("cnt"), asc("term"))
    vkeys.join(broadcast(qkeys), "key")
      .select("qterm", "term", "cnt").distinct()
      .filter(levenshtein(col("term"), col("qterm")) <= 1)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
