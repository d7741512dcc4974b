package graft

import graft.text.Bpe

/** Distributed BPE vocabulary learning (Sennrich et al. 2016) — merge
  * choice, tie-break, greedy application, and loop mechanics. */
class BpeSpec extends SparkSuiteBase {
  import spark.implicits._

  test("classic corpus: merges follow weighted pair frequencies") {
    // the Sennrich paper's example family: low(5) lower(2) newest(6) widest(3)
    val words = Seq(
      ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L)
    ).toDF("word", "freq")
    val (ledger, vocab) = Bpe.learn(spark, words, nMerges = 4)
    val steps = ledger.orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    // pair counts round 1: "e s" = 6+3 = 9 and "s t" = 9 tie -> "e s" wins
    // lexicographically; then "es t" = 9; then "est" fuses; "l o" = 7 next
    assert(steps(0) == ((1, "e s", 9L)))
    assert(steps(1) == ((2, "es t", 9L)))
    assert(steps(2)._2 == "l o" || steps(2)._2 == "o w") // 7 vs 7 tie -> "l o"
    assert(steps(2) == ((3, "l o", 7L)))
    assert(steps(3) == ((4, "lo w", 7L)))
    val v = vocab.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(v("newest") == "n e w est")
    assert(v("widest") == "w i d est")
    assert(v("low") == "low")
    assert(v("lower") == "low e r")
  }

  test("greedy merge application: overlapping runs merge left-to-right") {
    assert(Bpe.applyMerge(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(Bpe.applyMerge(Seq("a", "a", "a", "a"), "a", "a") == Seq("aa", "aa"))
    assert(Bpe.applyMerge(Seq("a", "a", "a", "a", "a"), "a", "a") == Seq("aa", "aa", "a"))
    assert(Bpe.applyMerge(Seq("x"), "a", "a") == Seq("x"))
    assert(Bpe.applyMerge(Seq.empty[String], "a", "b") == Seq.empty[String])
  }

  test("encode: training corpus reproduces learn's symbolization; unseen words encode") {
    // corpus whose word stream matches the classic Sennrich family
    val docs = Seq(
      (1L, ("low " * 5) + ("newest " * 3)),
      (2L, ("lower " * 2) + ("newest " * 3) + ("widest " * 3))
    ).toDF("doc_id", "text")
    val (ledger, vocab) = Bpe.learn(spark, Bpe.wordFreqs(docs, "text"), nMerges = 4)
    val merges = ledger.orderBy("step").collect()
      .map { r => val Array(a, b) = r.getString(1).split(" ", 2); (a, b) }.toSeq
    val rows = Bpe.encode(spark, docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // per-word BPE lengths from learn's own vocab
    val symLen = vocab.collect().map(r => r.getString(0) -> r.getString(1).split(" ").length.toLong).toMap
    // doc 1: 5×low + 3×newest; doc 2: 2×lower + 3×newest + 3×widest
    assert(rows(1L) == ((5 * symLen("low") + 3 * symLen("newest"), 8L)))
    assert(rows(2L) == ((2 * symLen("lower") + 3 * symLen("newest") + 3 * symLen("widest"), 8L)))
    // unseen word: deterministic char-level start + learned merges apply
    val unseen = Seq((9L, "lowest")).toDF("doc_id", "text")
    val u = Bpe.encode(spark, unseen, "doc_id", "text", merges).collect().head
    // l o w e s t -> (e s)-> l o w es t -> (es t) -> l o w est -> (l o) ->
    // lo w est -> (lo w) -> low est = 2 symbols
    assert((u.getLong(1), u.getLong(2)) == ((2L, 1L)))
  }

  test("exhaustion: single-symbol vocabulary stops before nMerges") {
    val words = Seq(("a", 3L), ("b", 2L)).toDF("word", "freq")
    val (ledger, vocab) = Bpe.learn(spark, words, nMerges = 5)
    assert(ledger.count() == 0)
    assert(vocab.collect().map(_.getString(1)).sorted.toSeq == Seq("a", "b"))
  }

  test("driver fast-path equals the forced distributed rounds") {
    import spark.implicits._
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "freq")
    val (l1, v1) = graft.text.Bpe.learn(spark, words, nMerges = 6)
    val (l2, v2) = graft.text.Bpe.learn(spark, words, nMerges = 6,
      driverWordLimit = 0L)
    assert(l1.as[(Int, String, Long)].collect().toSet ==
      l2.as[(Int, String, Long)].collect().toSet)
    assert(v1.as[(String, String)].collect().toSet ==
      v2.as[(String, String)].collect().toSet)
  }
}
