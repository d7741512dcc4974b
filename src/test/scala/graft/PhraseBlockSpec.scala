package graft

import graft.text.PhraseBlock

/** Aho–Corasick banned-phrase gate (driver gate: q_blocklist). */
class PhraseBlockSpec extends SparkSuiteBase {

  /** Exact positional reference: count of all (overlapping) occurrences of
    * the padded phrase in the padded text — the same scan the DuckDB
    * oracle performs. */
  private def naive(text: String, phrase: String): Int = {
    val t = " " + text + " "
    val p = " " + phrase + " "
    (0 to t.length - p.length).count(j => t.regionMatches(j, p, 0, p.length))
  }

  private def acCounts(text: String, phrases: Seq[String]): Seq[Int] = {
    val ac = new PhraseBlock.Automaton(phrases.map(p => " " + p + " ").toArray)
    val c = new Array[Int](phrases.length)
    ac.countsInto(" " + text + " ", c)
    c.toSeq
  }

  test("pinned: overlap, nesting, boundaries, end-of-text phrase") {
    val ps = Seq("a a", "table hash", "table hash value", "zz")
    // "a a a" -> "a a" twice (overlapping); trigram hit implies bigram hit;
    // "stable hash" must NOT match "table hash" (word boundary);
    // phrase at the very END of the text must terminate (sentinel gotcha).
    assert(acCounts("a a a", ps) == Seq(2, 0, 0, 0))
    assert(acCounts("x table hash value y", ps) == Seq(0, 1, 1, 0))
    assert(acCounts("stable hash", ps) == Seq(0, 0, 0, 0))
    assert(acCounts("scan table hash", ps) == Seq(0, 1, 0, 0))
    assert(acCounts("", ps) == Seq(0, 0, 0, 0))
    assert(acCounts("zz", ps) == Seq(0, 0, 0, 1))
  }

  test("automaton == naive positional scan on generated word soup") {
    val vocab = Array("a", "b", "ab", "table", "hash", "value")
    val phrases = Seq("a a", "a b", "a b a", "table hash", "hash", "b ab")
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 300) {
      val text = (0 until rnd.nextInt(20)).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
      val got = acCounts(text, phrases)
      val want = phrases.map(naive(text, _))
      assert(got == want, s"text='$text' got=$got want=$want")
    }
  }

  test("annotate: aggregates, lexicographic top_phrase, null text, string ids") {
    import spark.implicits._
    val docs = Seq(
      ("doc://1", "table hash value a a a"),
      ("doc://2", "nothing banned here"),
      ("doc://3", null: String)
    ).toDF("url", "body")
    val out = PhraseBlock.annotate(spark, docs, "url", "body",
        Seq("a a", "table hash", "table hash value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getString(4))).sortBy(_._1)
    assert(out.toSeq == Seq(
      ("doc://1", 4L, 3L, true, "a a"),
      ("doc://2", 0L, 0L, false, ""),
      ("doc://3", 0L, 0L, false, "")))
  }
}
