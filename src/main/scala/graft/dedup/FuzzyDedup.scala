package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Record-linkage fuzzy dedup — the classic blocking + pairwise-edit-
  * distance pattern of entity resolution (Fellegi & Sunter 1969; the
  * standard blocking formulation surveyed in Christen 2012 — published
  * methods, public knowledge), the seventh dedup family: where MinHash
  * matches token-set overlap, this matches CHARACTER-level typos in short
  * keys (titles, names, product ids).
  *
  * Shape:
  *   1. NORMALIZE — matching string = lower(trim(s)); blocking and the
  *      edit metric both run on it (case-insensitive typo matching).
  *   2. BLOCK — key = (first `prefixLen` normalized chars, normalized
  *      length // `band`). Docs pair only within a block; the probe side
  *      is replicated to adjacent length bands so any pair within
  *      `maxDist` edits (hence within `maxDist` length diff — requires
  *      band ≥ maxDist) meeting in prefix also meets in band.
  *   3. CAP — per-block `row_number ≤ blockCap` pre-cap ordered by id
  *      (WindowGroupLimit: hot blocks truncate map-side — the engine's
  *      LSH-bucket discipline; deterministic smallest-ids-survive, so the
  *      cap is oracle-expressible even when it binds).
  *   4. MATCH — pairwise `levenshtein ≤ maxDist` inside the block; each
  *      unordered pair evaluated exactly once (smaller id joins its exact
  *      band, larger id arrives via the ±1 replication).
  *   5. VERDICT — greedy independent keep-first: a doc is a fuzzy dup iff
  *      it matches ANY smaller-id doc, `dup_of` = the smallest such id.
  *      (Independent, not chain-transitive: a superseded doc still
  *      suppresses its own near-matches — the SQL-expressible membership
  *      rule, same design as the streaming near-dup relation.)
  *
  * Recall trades, stated not hidden (house style): an edit inside the
  * blocking prefix escapes the block (the standard blocking trade — run a
  * second pass with a different prefix/key for multi-pass blocking), and
  * capped block tails are not paired. The edit-distance metric itself is
  * integer — no float contract anywhere.
  *
  * Scale shape: one narrow key projection; ONE shuffle on the blocking
  * key (the self-join); per-block work bounded by blockCap²; the verdict
  * aggregate and the final left join key on the high-cardinality doc id.
  */
object FuzzyDedup {

  /** (id, s, is_fuzzy_dup, dup_of) for every input row. `idCol` keeps its
    * natural type and ordering (numeric ids compare numerically). */
  def annotate(docs: DataFrame, idCol: String, strCol: String,
               prefixLen: Int = 8, band: Int = 4, maxDist: Int = 2,
               blockCap: Int = 10000): DataFrame = {
    require(band >= maxDist,
      s"band ($band) must be >= maxDist ($maxDist) or adjacent-band probing misses pairs")
    require(prefixLen > 0 && blockCap > 1, "bad prefixLen/blockCap")
    val keyed = docs
      .select(col(idCol).as("id"), col(strCol).as("s"),
        lower(trim(col(strCol))).as("n"))
      .select(col("id"), col("s"), col("n"),
        substring(col("n"), 1, prefixLen).as("pfx"),
        expr(s"length(n) div $band").as("band"))
    // pre-cap per block, smallest ids first (deterministic + replicable)
    val w = Window.partitionBy("pfx", "band").orderBy("id")
    val capped = keyed.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= blockCap).drop("__rn", "s")
    val probe = capped.select(col("id").as("id_b"), col("n").as("n_b"),
      col("pfx"), explode(array(col("band") - 1, col("band"),
        col("band") + 1)).as("band"))
    val pairs = capped.join(probe, Seq("pfx", "band"))
      .filter(col("id") < col("id_b") &&
        levenshtein(col("n"), col("n_b")) <= maxDist)
    val verdict = pairs.groupBy(col("id_b").as("id"))
      .agg(min(col("id")).as("dup_of"))
    keyed.select(col("id"), col("s"))
      .join(verdict, Seq("id"), "left")
      .select(col("id"), col("s"),
        col("dup_of").isNotNull.as("is_fuzzy_dup"), col("dup_of"))
  }
}
