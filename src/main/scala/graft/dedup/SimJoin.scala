package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT Jaccard similarity self-join via prefix filtering — the
  * SSJoin/PPJoin family (Chaudhuri, Ganti & Kaushik ICDE'06; Xiao et
  * al. WWW'08): the exact counterpart of the MinHash/SimHash
  * APPROXIMATE near-dup paths, for when the contract is "every pair
  * with J ≥ t, no misses, no estimates".
  *
  * Prefix-filter theorem: order every set by one GLOBAL total order
  * (ascending key frequency, rarest first — the order that minimizes
  * candidates — ties by key) and keep each set's first
  * n − ⌈t·n⌉ + 1 keys as its PREFIX. Two sets with Jaccard ≥ t must
  * share a prefix key, so the candidate join runs on prefixes only;
  * an exact intersection count then verifies each candidate. The
  * threshold is a RATIONAL tn/td and the verify predicate
  * td·common ≥ tn·(n_a + n_b − common) is all-integer — no float
  * contract anywhere.
  *
  * Plan shape at 100 TB: one aggregate for key frequencies, one
  * per-set sort (bounded by set size), the candidate join keyed on
  * prefix keys (the published bound: rare keys have tiny posting
  * lists, the frequent-key tail never enters the join), and the
  * verify join bounded by |candidates| · set size. No windows over
  * global order, no cross product. */
object SimJoin {

  /** Exact Jaccard self-join of a (id, key) set relation: all pairs
    * (id_a < id_b) with J ≥ tn/td, as (id_a, id_b, common, n_a, n_b). */
  def jaccardJoin(sets: DataFrame, idCol: String, keyCol: String,
                  tn: Int, td: Int): DataFrame = {
    require(tn > 0 && tn <= td, s"threshold $tn/$td must be in (0, 1]")
    val toks = sets.filter(col(idCol).isNotNull)
      .select(col(idCol).as("id"), col(keyCol).as("key")).distinct()
    val dfRel = toks.groupBy("key").agg(count(lit(1)).as("kdf"))
    val ordered = toks.join(dfRel, "key")
      .groupBy("id").agg(sort_array(collect_list(struct(col("kdf"), col("key")))).as("ks"))
      .select(col("id"), col("ks"), size(col("ks")).cast("long").as("n"))
    // prefix length n − ⌈t·n⌉ + 1 (⌈⌉ in exact integer arithmetic)
    val prefix = ordered.select(col("id"),
      explode(expr(s"slice(ks, 1, cast(n - (($tn * n + ${td - 1}) div $td) + 1 as int))")).as("p"))
      .select(col("id"), col("p.key").as("key"))
    val cands = prefix.as("x").join(prefix.as("y"),
        col("x.key") === col("y.key") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b")).distinct()
    // exact verify: |A ∩ B| per candidate, then the integer predicate
    val common = cands
      .join(toks.select(col("id").as("id_a"), col("key")), "id_a")
      .join(toks.select(col("id").as("id_b"), col("key")), Seq("id_b", "key"), "left_semi")
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("common"))
    // set sizes from the distinct token relation directly (n == size(ks)
    // definitionally): deriving them from `ordered` re-ran the expensive
    // sorted-collect_list aggregate once per sizes leg — `ordered` pruned
    // to (id, n) no longer canonicalizes equal to the prefix branch, so
    // AQE's stage cache forks the subtree (the per-branch-pruning gotcha);
    // this cheap count aggregate reuses toks' distinct exchange instead
    val sizes = toks.groupBy("id").agg(count(lit(1)).as("n"))
    common
      .join(sizes.select(col("id").as("id_a"), col("n").as("n_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("n").as("n_b")), "id_b")
      .filter(lit(td.toLong) * col("common") >=
        lit(tn.toLong) * (col("n_a") + col("n_b") - col("common")))
      .select("id_a", "id_b", "common", "n_a", "n_b")
  }

  /** [[jaccardJoin]] over word-5-gram shingle-hash sets ([[MinHash.shingles]]
    * — the same sets the approximate near-dup paths estimate over, so
    * this is their exact cross-check). */
  def shingleJoin(docs: DataFrame, idCol: String, textCol: String,
                  tn: Int, td: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sets = docs.filter(col(idCol).isNotNull)
      .select(col(idCol).cast("long").as("id"), col(textCol).cast("string").as("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        MinHash.shingles(Option(text).getOrElse("")).iterator.map(h => (id, h)) }
      .toDF("id", "h")
    jaccardJoin(sets, "id", "h", tn, td)
  }
}
