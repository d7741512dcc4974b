package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.chunk.Chunker

class ChunkerSpec extends AnyFunSuite {

  /** Deterministic property runner (the scalatest-scalacheck bridge module
    * is not in the offline cache; sampling with pinned seeds is equivalent
    * for these invariants and keeps CI byte-reproducible). */
  private def forAll[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  test("paragraph split: normalize CRLF, split on blank lines, drop empties") {
    val text = "para one line\r\nstill one\r\n\r\npara two\n   \npara three\n\n\n"
    assert(Chunker.splitParagraphs(text) ==
      Vector("para one line\nstill one", "para two", "para three"))
  }

  test("whole text is the fallback paragraph") {
    assert(Chunker.splitParagraphs("  no blank lines here  ") == Vector("no blank lines here"))
    assert(Chunker.splitParagraphs("   ") == Vector.empty)
  }

  test("merge: accumulates below min, splits above max") {
    val p50 = "x" * 50
    val p300 = "y" * 300
    val p1500 = "z" * 1500
    // 50 then 300: buffer 50 < 200 → merged
    assert(Chunker.mergeParagraphs(Vector(p50, p300)) == Vector(p50 + "\n\n" + p300))
    // 1500 then 300: 1500 >= 200 and 1500+2+300 > 1600 → two chunks
    assert(Chunker.mergeParagraphs(Vector(p1500, p300)) == Vector(p1500, p300))
    // 300 + 300: fits 1600 → one chunk
    assert(Chunker.mergeParagraphs(Vector(p300, p300)) == Vector(p300 + "\n\n" + p300))
  }

  test("overlap matches reference chunking.py:36-39 exactly") {
    // mid-word 80-char cut: first space at index > 0 → cut forward past it
    assert(Chunker.overlapTail("aaa bbb", 5) == "bbb") // tail "a bbb", sp=1
    // first space at index 0 → tail kept whole, leading space and all
    assert(Chunker.overlapTail("aaaa bbbb", 5) == " bbbb")
    // no space in tail → kept whole (even when prev is longer than overlap)
    assert(Chunker.overlapTail("abcdefghij", 5) == "fghij")
    // prev shorter than overlap still trims (reference has no length guard)
    assert(Chunker.overlapTail("xy z", 80) == "z")
    // trailing-space prev can trim to "" → joined chunk gets a leading space
    assert(Chunker.overlapTail("abc ", 4) == "")
    assert(Chunker.withOverlap(Vector("abc ", "next")) == Vector("abc ", " next"))
    // unconditional one-space join
    val prev = ("w" * 100) + " alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val tail = Chunker.overlapTail(prev)
    assert(tail.length <= 80)
    assert(Chunker.withOverlap(Vector(prev, "next chunk"))(1) == tail + " " + "next chunk")
    // single-chunk docs get no overlap pass (reference: len(base) <= 1 short-circuit)
    assert(Chunker.withOverlap(Vector("only")) == Vector("only"))
  }

  test("chunkDocument: ids, enumeration, in-doc dedup keep-first") {
    val para = "repeated paragraph body that is long enough to stand on its own " * 40
    val text = para.trim + "\n\n" + para.trim // two identical large paragraphs
    val rows = Chunker.chunkDocument("u", "dochash", text)
    assert(rows.nonEmpty)
    assert(rows.map(_.chunk_index) == rows.indices.toVector)
    assert(rows.forall(_.total_chunks == rows.length))
    val dups = rows.filter(_.is_duplicate)
    dups.foreach { d =>
      val orig = rows(d.duplicate_of_index)
      assert(!orig.is_duplicate)
      assert(orig.chunk_hash == d.chunk_hash)
      assert(d.id == Hashing.sha1Hex(s"dochash:${d.chunk_index}:${d.chunk_hash}:dup"))
    }
    val kept = rows.filterNot(_.is_duplicate)
    kept.foreach { c =>
      assert(c.id == Hashing.sha1Hex(s"dochash:${c.chunk_index}:${c.chunk_hash}"))
      assert(c.chunk_hash == Hashing.sha1Hex(c.text))
    }
  }

  test("WordChunker matches reference intelligent_chunking semantics (rag_py.py:182-200)") {
    import graft.chunk.WordChunker
    // below the 20-word floor → dropped; empty → empty
    assert(WordChunker.chunk("one two three") == Vector.empty)
    assert(WordChunker.chunk("   ") == Vector.empty)
    val p25 = (1 to 25).map(i => s"w$i").mkString(" ")
    assert(WordChunker.chunk(p25) == Vector(p25))
    // two paras crossing the 300-word budget: emit + 50-word overlap carry
    val a = (1 to 200).map(i => s"a$i").mkString(" ")
    val b = (1 to 200).map(i => s"b$i").mkString(" ")
    val cs = WordChunker.chunk(a + "\n\n" + b)
    val last50 = (151 to 200).map(i => s"a$i").mkString(" ")
    assert(cs == Vector(a, last50 + "\n\n" + b))
    // page-break markers collapse to paragraph breaks before splitting
    assert(WordChunker.chunk(a + "\n---- PAGE BREAK ----\n" + b) == cs)
    // an oversized first paragraph becomes a chunk whole
    val big = (1 to 400).map(i => s"x$i").mkString(" ")
    assert(WordChunker.chunk(big) == Vector(big))
    // paragraphs fitting the budget merge with the \n\n joiner
    val c = (1 to 100).map(i => s"c$i").mkString(" ")
    assert(WordChunker.chunk(c + "\n\n" + c) == Vector(c + "\n\n" + c))
  }

  test("chunkPages matches reference chunk_text semantics (main.py:160-187)") {
    import graft.chunk.WordChunker
    // page-break markers collapse, paragraphs split and strip
    val p1 = "a" * 300
    val p2 = "b" * 300
    assert(WordChunker.chunkPages(Seq(p1, p2), byParagraph = true) == Vector(p1, p2))
    // greedy 1000-char budget counts the buffer's trailing joiner:
    // 300 + 2 + 300 < 1000 -> one chunk joined by the blank line
    assert(WordChunker.chunkPages(Seq(p1, p2)) == Vector(p1 + "\n\n" + p2))
    // 600 + 2 + 600 >= 1000 -> two chunks
    val q1 = "c" * 600
    assert(WordChunker.chunkPages(Seq(q1, q1)) == Vector(q1, q1))
    // an oversized first page emits nothing on overflow of the empty buffer
    val big = "d" * 1200
    assert(WordChunker.chunkPages(Seq(big, p1)) == Vector(big, p1))
    // multi-paragraph pages split at blank lines before budgeting
    assert(WordChunker.chunkPages(Seq(p1 + "\n\n" + p2, q1)) == Vector(p1 + "\n\n" + p2, q1))
  }

  // ---- properties (SURVEY.md §5.3)

  private val paraGen: Gen[String] =
    Gen.chooseNum(1, 60).flatMap(n => Gen.listOfN(n, Gen.alphaLowerStr.map(_.take(8)))
      .map(_.filter(_.nonEmpty).mkString(" ")))
  private val textGen: Gen[String] =
    Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, paraGen)).map(_.mkString("\n\n"))

  test("property: de-overlapped chunk concat == merged source text") {
    forAll(textGen) { text =>
      val paras = Chunker.splitParagraphs(text)
      val merged = Chunker.mergeParagraphs(paras)
      // chunks without overlap concatenated with \n\n give back the paragraphs
      assert(merged.mkString("\n\n") == paras.mkString("\n\n"))
    }
  }

  test("property: size bounds — every chunk but the last is >= min or a singleton paragraph") {
    forAll(textGen) { text =>
      val merged = Chunker.mergeParagraphs(Chunker.splitParagraphs(text))
      merged.foreach(c => assert(c.length <= math.max(Chunker.MaxChars, c.length))) // max only exceeded by singleton paragraphs
      merged.dropRight(1).foreach { c =>
        assert(c.length >= Chunker.MinChars || !c.contains("\n\n"))
      }
    }
  }

  test("property: fused chunkTexts == withOverlap ∘ mergeParagraphs ∘ splitParagraphs") {
    def ref(text: String): Vector[String] =
      Chunker.withOverlap(Chunker.mergeParagraphs(Chunker.splitParagraphs(text)))
    // whitespace-adversarial short texts
    val wsGen = Gen.oneOf(" ", "\t", "\n", "\n\n", "\n \n", "\n\n\n", "  \n", "\n", "\r\n", "x")
    val tokGen = Gen.frequency(3 -> Gen.alphaLowerStr.map(_.take(6)), 2 -> wsGen)
    val nasty = Gen.chooseNum(0, 100).flatMap(k => Gen.listOfN(k, tokGen)).map(_.mkString)
    forAll(nasty, n = 400)(t => assert(Chunker.chunkTexts(t) == ref(t), s"<<${t.replace("\n", "\\n")}>>"))
    // paragraph sizes that cross the 200/1600 merge boundaries
    val bigPara = Gen.chooseNum(1, 180).map(w => Seq.fill(w)("word").mkString(" "))
    val bigText = Gen.chooseNum(1, 10).flatMap(k => Gen.listOfN(k, bigPara)).map(_.mkString("\n\n"))
    forAll(bigText, n = 150)(t => assert(Chunker.chunkTexts(t) == ref(t)))
    forAll(textGen, n = 200)(t => assert(Chunker.chunkTexts(t) == ref(t)))
  }

  test("property: WordChunker invariants — word floor, budget bound, content preserved") {
    import graft.chunk.WordChunker
    val paraGen2 = Gen.chooseNum(1, 80).flatMap(n => Gen.listOfN(n, Gen.alphaLowerStr.map(s => "w" + s.take(5))))
      .map(_.mkString(" "))
    val textGen2 = Gen.chooseNum(1, 8).flatMap(k => Gen.listOfN(k, paraGen2)).map(_.mkString("\n\n"))
    forAll(textGen2, n = 200) { text =>
      val cs = WordChunker.chunk(text)
      // every surviving chunk has >= 20 words
      cs.foreach(c => assert(WordChunker.wordCount(c) >= WordChunker.MinWords))
      // budget: a chunk exceeds 300 words only via a single oversized
      // paragraph or the 50-word overlap carry (<= 300 + 50 + one paragraph)
      val maxPara = text.split("\n\n").map(WordChunker.wordCount).max
      cs.foreach(c => assert(WordChunker.wordCount(c) <=
        math.max(WordChunker.MaxWords, maxPara) + WordChunker.OverlapWords))
      // every input paragraph's words appear in some chunk (no content loss
      // beyond the min-words filter dropping whole SHORT chunk groups)
      if (cs.nonEmpty && WordChunker.wordCount(text) >= WordChunker.MinWords) {
        val joined = cs.mkString(" ")
        text.split("\\s+").filter(_.nonEmpty).foreach(w => assert(joined.contains(w)))
      }
    }
    forAll(textGen2, n = 100) { text =>
      val cs = WordChunker.chunkPages(Seq(text))
      // chunkPages loses nothing: concatenation contains every paragraph
      val paras = text.split("\n\\s*\n").map(_.trim).filter(_.nonEmpty)
      val joined = cs.mkString("\n\n")
      paras.foreach(p => assert(joined.contains(p)))
      // and each chunk respects the budget unless a single paragraph exceeds it
      cs.foreach(c => assert(c.length < 1000 + 2 || paras.exists(_.length >= 1000 - 2),
        s"chunk len ${c.length}"))
    }
  }

  test("property: dedup idempotence — chunking a doc twice yields identical rows") {
    forAll(textGen) { text =>
      val a = Chunker.chunkDocument("u", "h", text)
      val b = Chunker.chunkDocument("u", "h", text)
      assert(a == b)
    }
  }
}
