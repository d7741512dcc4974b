package graft

import graft.index.Bm25
import graft.jobs.IndexJob
import org.apache.spark.sql.functions._

/** Positional postings in the materialized index: phraseSearch equals the
  * corpus-scan phraseMatches across segments, upserts and compaction. */
class PositionalIndexSpec extends SparkSuiteBase {
  import spark.implicits._

  private def chunkRows(docs: Seq[(String, String)]) =
    docs.toDF("id", "text").withColumn("is_duplicate", lit(false))

  private def matches(root: String, phrase: String) =
    IndexJob.phraseSearch(spark, root, phrase)
      .as[(String, Long)].collect().toMap

  private def brute(docs: Seq[(String, String)], phrase: String) =
    Bm25.phraseMatches(docs.toDF("id", "text"), "id", "text", phrase)
      .as[(String, Long)].collect().toMap

  private val corpus = Seq(
    "a" -> "the quick brown fox jumps over the quick brown dog",
    "b" -> "quick brown things and other quick brown things again",
    "c" -> "no occurrences here at all",
    "d" -> "a b a b a") // overlapping repeated-term phrase territory

  test("two segments: phraseSearch == corpus-scan slot-fill") {
    val root = java.nio.file.Files.createTempDirectory("posidx").toString
    IndexJob.build(spark, chunkRows(corpus.take(2)), root, positions = true)
    IndexJob.build(spark, chunkRows(corpus.drop(2)), root, positions = true)
    for (p <- Seq("quick brown", "a b a", "missing phrase")) {
      assert(matches(root, p) == brute(corpus, p), p)
    }
    // compaction preserves every phrase verdict
    IndexJob.compact(spark, root)
    assert(matches(root, "quick brown") == brute(corpus, "quick brown"))
    assert(matches(root, "a b a") == brute(corpus, "a b a"))
  }

  test("upsert: tombstone + re-append moves the phrase counts") {
    val root = java.nio.file.Files.createTempDirectory("posidx2").toString
    IndexJob.build(spark, chunkRows(corpus), root, positions = true)
    val mutated = corpus.map {
      case ("c", _) => "c" -> "now quick brown lives here quick brown twice"
      case other    => other
    }
    IndexJob.tombstone(spark, root, Seq("c").toDF("doc"))
    IndexJob.build(spark, chunkRows(mutated.filter(_._1 == "c")), root,
      positions = true)
    assert(matches(root, "quick brown") == brute(mutated, "quick brown"))
    IndexJob.compact(spark, root)
    assert(matches(root, "quick brown") == brute(mutated, "quick brown"))
  }

  test("an index built without positions refuses phrase queries loudly") {
    val root = java.nio.file.Files.createTempDirectory("posidx3").toString
    IndexJob.build(spark, chunkRows(corpus.take(2)), root)
    val e = intercept[RuntimeException](matches(root, "quick brown"))
    assert(e.getMessage.contains("positions"))
  }

  test("PARTIAL positional coverage refuses loudly instead of silently omitting docs") {
    val root = java.nio.file.Files.createTempDirectory("posidx4").toString
    IndexJob.build(spark, chunkRows(corpus.take(2)), root, positions = true)
    IndexJob.build(spark, chunkRows(corpus.drop(2)), root) // no positions
    val e = intercept[IllegalArgumentException](matches(root, "quick brown"))
    assert(e.getMessage.contains("lack"))
  }
}
