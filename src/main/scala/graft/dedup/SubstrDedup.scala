package graft.dedup

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window
import graft.Hashing

/** Corpus-wide exact duplicated-substring removal — the distributed
  * approximation of the ExactSubstr dedup of Lee et al. 2021
  * ("Deduplicating Training Data Makes Language Models Better"), which the
  * training-data literature applies AFTER document-level near-dup: long
  * token runs shared verbatim between documents (license boilerplate,
  * quoted articles, templated listings) are removed from every occurrence
  * except the first, keeping one canonical copy in the corpus.
  *
  * The reference paper builds a single suffix array over the whole corpus
  * on one large machine; that is not a Spark shape. The standard
  * distributed approximation (used at CCNet/Dolma scale) works at
  * fixed-width token-window granularity:
  *
  *   1. slide a `w`-token window over each document (narrow flatMap —
  *      per-doc work, chunk-class memory);
  *   2. rank every window occurrence corpus-wide by `(id, pos)` within its
  *      window-hash group — ONE shuffle, keyed by the 64-bit window hash
  *      (high-cardinality, uniform; the same key class as MinHash
  *      shingles). WindowGroupLimit map-side truncation does NOT apply
  *      here (the rn > 1 side is the one we keep), but the per-group sort
  *      is bounded by per-window occurrence counts;
  *   3. ship only the DUPLICATE window starts back to their documents
  *      (grouped per doc — the only per-doc state is the sorted start
  *      list, bounded by token count) and cut the covered token ranges out
  *      in one narrow map.
  *
  * Overlapping duplicate windows merge via a boolean coverage mask, so a
  * duplicated run of any length ≥ w is removed wholly, not per-window.
  * Windows never cross document boundaries; runs shorter than `w` tokens
  * are never touched (the paper's min-match-length knob).
  *
  * Tokenization is whitespace-split and reassembly joins with single
  * spaces, so `clean_text` is whitespace-normalized for EVERY doc (also
  * the ones with nothing removed) — the deterministic contract the DuckDB
  * oracle replicates token-for-token (md5-top-64 window hashes, exactly
  * [[graft.Hashing.md5Long]]).
  */
object SubstrDedup {

  /** Default window width in tokens. Lee et al. use 50 BPE tokens; the
    * test corpora are short word-salad docs, so specs/gates pass smaller
    * widths explicitly. */
  val DefaultWindow = 50

  /** Remove every non-first occurrence of any `w`-token run that appears
    * more than once corpus-wide.
    *
    * @return (id, n_tokens, removed_tokens, clean_text) — one row per
    *         input doc; `clean_text` is the surviving tokens joined with
    *         single spaces.
    */
  def clean(docs: DataFrame, idCol: String, textCol: String,
            w: Int = DefaultWindow): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(w >= 2, s"window width must be >= 2, got $w")

    // local defs only — a reference to a SubstrDedup method inside the
    // lambdas below would capture the (non-serializable) object
    val width = w
    def tok(text: String): Array[String] =
      text.split("\\s+").filter(_.nonEmpty)

    val base = docs
      .select(F.col(idCol).cast("string").as("id"), F.col(textCol).as("text"))
      .as[(String, String)]

    // (window hash, doc, start) for every w-token window — narrow
    val windows = base.flatMap { case (id, text) =>
      val ts = tok(text)
      if (ts.length < width) Iterator.empty
      else (0 to ts.length - width).iterator.map { p =>
        (Hashing.md5Long(ts.slice(p, p + width).mkString(" ")), id, p)
      }
    }.toDF("whash", "id", "pos")

    // keep-first rank within each identical window; ties impossible
    // ((id, pos) is unique per occurrence)
    val rn = F.row_number()
      .over(Window.partitionBy("whash").orderBy("id", "pos"))
    val removalStarts = windows
      .withColumn("rn", rn)
      .filter(F.col("rn") > 1)
      .groupBy("id")
      .agg(F.sort_array(F.collect_list(F.col("pos"))).as("starts"))

    base.toDF("id", "text")
      .join(removalStarts, Seq("id"), "left")
      .select(F.col("id"), F.col("text"),
        F.coalesce(F.col("starts"), F.array()).as("starts"))
      .as[(String, String, Seq[Int])]
      .map { case (id, text, starts) =>
        val ts = tok(text)
        val covered = new Array[Boolean](ts.length)
        starts.foreach { s =>
          var i = s
          while (i < s + width) { covered(i) = true; i += 1 }
        }
        var removed = 0
        val kept = new scala.collection.mutable.ArrayBuffer[String](ts.length)
        var i = 0
        while (i < ts.length) {
          if (covered(i)) removed += 1 else kept += ts(i)
          i += 1
        }
        (id, ts.length, removed, kept.mkString(" "))
      }
      .toDF("id", "n_tokens", "removed_tokens", "clean_text")
  }
}
