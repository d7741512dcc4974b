package graft

import org.apache.spark.sql.functions._
import graft.dedup.SubstrDedup

/** ExactSubstr-style duplicated-run removal (Lee et al. 2021, fixed-width
  * window approximation): keep-first by (id, pos), overlapping duplicate
  * windows merge into whole covered runs, runs shorter than w untouched. */
class SubstrDedupSpec extends SparkSuiteBase {
  import spark.implicits._

  private def runClean(rows: Seq[(String, String)], w: Int): Map[String, (Int, Int, String)] =
    SubstrDedup.clean(rows.toDF("id", "text"), "id", "text", w)
      .select(col("id"), col("n_tokens"), col("removed_tokens"), col("clean_text"))
      .collect()
      .map(r => r.getString(0) -> ((r.getInt(1), r.getInt(2), r.getString(3))))
      .toMap

  test("cross-doc duplicate run: first (min id, pos) occurrence kept, later cut") {
    val out = runClean(Seq(
      "1" -> "alpha beta gamma delta unique one two three",
      "2" -> "prefix words here alpha beta gamma delta suffix tail"), w = 4)
    assert(out("1") == ((8, 0, "alpha beta gamma delta unique one two three")))
    assert(out("2") == ((9, 4, "prefix words here suffix tail")))
  }

  test("in-doc repetition: second occurrence removed, first kept") {
    val out = runClean(Seq("3" -> "one two three four one two three four"), w = 4)
    assert(out("3") == ((8, 4, "one two three four")))
  }

  test("run longer than w: overlapping duplicate windows merge to the whole run") {
    val out = runClean(Seq(
      "4" -> "start red orange yellow green blue violet end",
      "5" -> "intro words red orange yellow green blue violet outro"), w = 4)
    assert(out("4") == ((8, 0, "start red orange yellow green blue violet end")))
    // covered = union of the three shifted windows = the full 6-token run
    assert(out("5") == ((9, 6, "intro words outro")))
  }

  test("docs shorter than w are never touched; whitespace is normalized") {
    val out = runClean(Seq(
      "6" -> "tiny doc",
      "7" -> "  spaced\tout   doc seven  ",
      "8" -> ""), w = 4)
    assert(out("6") == ((2, 0, "tiny doc")))
    assert(out("7") == ((4, 0, "spaced out doc seven")))
    assert(out("8") == ((0, 0, "")))
  }
}
