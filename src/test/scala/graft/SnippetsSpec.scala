package graft

import graft.index.Snippets

/** KWIC snippets: hand-computed best windows, tie-to-earliest, short-doc
  * whole-window, zero-hit exclusion, normalization. */
class SnippetsSpec extends SparkSuiteBase {
  import spark.implicits._

  private def run(docs: Seq[(String, String)], query: String, width: Int) =
    Snippets.of(docs.toDF("id", "text"), "id", "text", query, width)
      .as[(String, Long, Long, String)].collect().toSet

  test("densest window wins: two hits beat one, window placed exactly") {
    // tokens:        1    2    3     4    5    6    7     8    9
    val text = "apple one spark two three four spark join five"
    val got = run(Seq("d" -> text), "spark join", width = 3)
    // windows of 3: [5..7]=1, [6..8]=2 (spark,join), [7..9]=2 -> earliest 6
    assert(got == Set(("d", 6L, 2L, "four spark join")))
  }

  test("tie goes to the earliest window") {
    val text = "spark a b c spark d e f"
    val got = run(Seq("d" -> text), "spark", width = 2)
    assert(got == Set(("d", 1L, 1L, "spark a")))
  }

  test("doc shorter than the width scores one whole-doc window") {
    val got = run(Seq("d" -> "tiny spark doc"), "spark", width = 10)
    assert(got == Set(("d", 1L, 1L, "tiny spark doc")))
  }

  test("zero-hit and empty docs emit nothing") {
    val got = run(Seq("a" -> "no relevant words here", "b" -> "",
      "c" -> "spark lives here"), "spark", width = 4)
    assert(got == Set(("c", 1L, 1L, "spark lives here")))
  }

  test("normalization: case and punctuation fold into the token stream") {
    val got = run(Seq("d" -> "Intro... SPARK, filter!"), "spark filter", width = 2)
    assert(got == Set(("d", 2L, 2L, "spark filter")))
  }

  test("repeated query terms count every occurrence") {
    val text = "spark spark spark other words beyond"
    val got = run(Seq("d" -> text), "spark", width = 3)
    assert(got == Set(("d", 1L, 3L, "spark spark spark")))
  }
}
