package graft

import org.apache.spark.sql.functions._
import graft.index.Context
import graft.text.{UrlCanon, Vocab}

/** Context assembly (R5's offline half), URL canonicalization, vocab
  * induction and unigram-LM scoring — behavior pins for the round-5
  * coverage additions. */
class ContextVocabSpec extends SparkSuiteBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark filter join table spark filter"), // 6 toks -> strong match
    (2L, "filter join"),                          // 2 toks
    (3L, "table only spark"),                     // weak match
    (4L, "nothing relevant at all whatsoever"),   // no match
    (5L, "join join join join")                   // 4 toks, one term
  ).toDF("doc_id", "text")

  test("context assembly: rank order, prefix truncation at the budget") {
    // tokens = max(1, len/4): doc1=9, doc2=2, doc3=4, doc5=4
    val all = Context.assemble(docs, "doc_id", "text", "spark filter join table",
      k = 10, tokenBudget = 1000).orderBy("rank").collect()
    assert(all.map(_.getLong(0)).toSeq == (1L to all.length))          // dense ranks
    assert(all.map(r => r.getLong(3)).toSeq == all.map(_.getLong(2)).scanLeft(0L)(_ + _).tail.toSeq) // cum
    val ids = all.map(_.getLong(1)).toSeq
    assert(ids.head == 1L && !ids.contains(4L)) // best doc first, non-match absent

    // budget cuts after the first doc (9 tokens): second doc would overflow 10
    val cut = Context.assemble(docs, "doc_id", "text", "spark filter join table",
      k = 10, tokenBudget = 10).collect()
    assert(cut.map(_.getLong(1)).toSeq == Seq(1L))
  }

  test("context prompt: selected texts joined in rank order") {
    val p = Context.prompt(docs, "doc_id", "text", "spark filter join table",
      k = 2, tokenBudget = 1000, sep = " | ").head()
    val first = Context.assemble(docs, "doc_id", "text", "spark filter join table",
      k = 2, tokenBudget = 1000).orderBy("rank")
      .collect().map(_.getLong(1))
    assert(p.getLong(1) == first.length)
    assert(p.getString(0).split(" \\| ").length == first.length)
    assert(p.getString(0).startsWith("spark filter join table spark filter"))
  }

  test("url canonicalization rules: case, port, fragment, trackers, empty query") {
    val in = Seq(
      "HTTPS://Example.COM:443/Path/A?utm_source=x&b=2#frag",
      "https://example.com/Path/A?b=2",
      "http://Host.net:80/p?utm_a=1&utm_b=2",      // trackers only -> no query
      "http://host.net/p",
      "https://h.io/q?",                           // bare ? stripped
      "https://h.io/q",
      "https://h.io/r?a=1&gclid=zzz&c=3",          // mid tracker dropped, order kept
      "https://h.io/CaseKept/Path?X=Y"             // path/query case preserved
    ).toDF("url")
    val out = in.select(UrlCanon.canonicalCol(col("url")).as("c")).as[String].collect()
    assert(out(0) == "https://example.com/Path/A?b=2")
    assert(out(0) == out(1))
    assert(out(2) == "http://host.net/p")
    assert(out(2) == out(3))
    assert(out(4) == "https://h.io/q" && out(4) == out(5))
    assert(out(6) == "https://h.io/r?a=1&c=3")
    assert(out(7) == "https://h.io/CaseKept/Path?X=Y")
  }

  test("vocab induction: frequency order with lexicographic tie-break") {
    val v = Vocab.top(docs, "text", 3).orderBy("rank")
      .collect().map(r => (r.getLong(2), r.getString(0), r.getLong(1)))
    // join: 1+1+4=6, filter: 3, spark: 3 -> filter beats spark on the tie
    assert(v.toSeq == Seq((1L, "join", 6L), (2L, "filter", 3L), (3L, "spark", 3L)))
  }

  test("unigram-LM nll: rarer vocabulary scores higher; token counts exact") {
    val lm = Vocab.lmScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(lm(1L)._1 == 6 && lm(5L)._1 == 4)
    // doc5 is all 'join' (the most common term) -> lowest nll;
    // doc4 is all hapaxes -> highest nll
    val byNll = lm.toSeq.sortBy(_._2._2).map(_._1)
    assert(byNll.head == 5L && byNll.last == 4L)
    // doc5 closed form: -ln(6/20) per token (corpus total 20 tokens)
    assert(math.abs(lm(5L)._2 - BigDecimal(-math.log(6.0 / 20.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }
  test("prefix completion: per-prefix frequency order, k cut, absent prefix empty") {
    val got = Vocab.complete(docs, "text", Seq("jo", "s", "zz"), k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    // "jo" -> join(6); "s" -> spark(3) then whatever s-term is next by (cnt, term)
    assert(got.count(_._1 == "zz") == 0)
    assert(got.filter(_._1 == "jo").toSeq == Seq(("jo", 1L, "join", 6L)))
    val sTop = got.filter(_._1 == "s")
    assert(sTop.head == (("s", 1L, "spark", 3L)) && sTop.size <= 2)
  }
}
