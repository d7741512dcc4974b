package graft

import scala.io.Source
import graft.corpus.PageGen
import graft.extract.Extract
import graft.chunk.Chunker
import graft.index.Bm25

/** The byte-identity contract (north rule): recompute extraction over the
  * seeded 1k corpus and compare SHA-256 of extracted text per url against
  * the pinned golden fixtures — 100% must match
  * (BASELINE.md "byte-identical-text match rate"). */
class GoldenFixtureSpec extends SparkSuiteBase {
  import spark.implicits._

  private def fixtureLines(name: String): Vector[Map[String, String]] = {
    val url = getClass.getResource(s"/golden/$name")
    assert(url != null, s"missing fixture $name")
    val src = Source.fromURL(url, "UTF-8")
    try src.getLines().filter(_.nonEmpty).toVector.map { line =>
      // flat JSON object of string/number fields
      "\"([a-z0-9_]+)\":(\"((?:[^\"\\\\]|\\\\.)*)\"|[-0-9.]+)".r
        .findAllMatchIn(line).map { m =>
          val v = if (m.group(3) != null) unesc(m.group(3)) else m.group(2)
          m.group(1) -> v
        }.toMap
    } finally src.close()
  }

  private def unesc(s: String): String = {
    val sb = new StringBuilder; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'u' => sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
          case o => sb.append(o); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private lazy val extracted: Map[String, ExtractedDoc] = {
    implicit val s = spark
    val pages = spark.range(graft.tools.GenFixtures.N).repartition(16)
      .map(i => PageGen.row(graft.tools.GenFixtures.Seed, i))
    Extract.runSalted(pages, 16).collect().map(d => d.url -> d).toMap
  }

  test("extraction matches golden fixtures byte-identically (100% of 1000 urls)") {
    val golden = fixtureLines("extract-1k.jsonl")
    assert(golden.size == 1000)
    var mismatches = List.empty[String]
    golden.foreach { g =>
      val url = g("url")
      val d = extracted.getOrElse(url, fail(s"url $url missing from extraction"))
      val ok = Hashing.sha256Hex(d.text) == g("text_sha256") &&
        d.kind == g("kind") && d.method == g("method") &&
        d.n_chars.toString == g("n_chars") && d.spans.length.toString == g("n_spans") &&
        d.text.take(64) == g("first_64")
      if (!ok) mismatches ::= url
    }
    assert(mismatches.isEmpty, s"${mismatches.length} fixture mismatches, e.g. ${mismatches.take(3)}")
  }

  test("parallelism does not change results: repartition(3) == repartition(16)") {
    implicit val s = spark
    val pages3 = spark.range(graft.tools.GenFixtures.N).repartition(3)
      .map(i => PageGen.row(graft.tools.GenFixtures.Seed, i))
    val alt = Extract.run(pages3).collect().map(d => d.url -> Hashing.sha256Hex(d.text)).toMap
    extracted.foreach { case (url, d) =>
      assert(alt(url) == Hashing.sha256Hex(d.text), s"parallelism-dependent result at $url")
    }
  }

  test("chunk fixtures match: counts, dup counts, id hashes") {
    val golden = fixtureLines("chunks-1k.jsonl")
    golden.foreach { g =>
      val d = extracted(g("url"))
      val rows = Chunker.chunkDocument(d.url, Hashing.sha256Hex(d.text), d.text)
      assert(rows.length.toString == g("n_chunks"), s"${g("url")} n_chunks")
      assert(rows.count(_.is_duplicate).toString == g("n_dups"), s"${g("url")} n_dups")
      assert(Hashing.sha1Hex(rows.map(_.id).mkString(",")) == g("ids_sha1"), s"${g("url")} ids")
    }
  }

  test("retrieval fixture: Newton-Raphson BM25 top-5 stable") {
    val golden = fixtureLines("retrieval-newton-top5.jsonl")
    val docsDf = extracted.values.filter(d => d.err.isEmpty && d.text.nonEmpty).toSeq
      .map(d => (d.url, d.text)).toDF("url", "text")
    val top = Bm25.search(docsDf, "url", "text", "newton raphson method", 5).collect()
    assert(top.length == golden.length)
    top.zip(golden).foreach { case (r, g) =>
      assert(r.getString(0) == g("url"), s"rank order: ${r.getString(0)} vs ${g("url")}")
      assert(math.abs(r.getDouble(1) - g("score").toDouble) < 1e-9)
    }
    // the pinned passage is actually present in the winners
    assert(extracted(golden.head("url")).text.contains("Newton Raphson method"))
  }
}
