package graft

import graft.index.Bm25
import graft.sim.Knn
import org.apache.spark.sql.functions._

class Bm25Spec extends SparkSuiteBase {
  import spark.implicits._

  private val docs = Seq(
    ("d1", "the newton raphson method finds roots of a function"),
    ("d2", "gradient descent minimizes a loss function by iterative steps"),
    ("d3", "newton iteration converges quadratically near the root"),
    ("d4", "completely unrelated text about cooking pasta dinner recipes"),
    ("d5", "newton newton newton raphson raphson method method method")
  ).toDF("id", "text")

  test("BM25 hand-computed score matches for a single-term query") {
    // query 'gradient': appears only in d2 (tf=1). N=5, df=1.
    // idf = ln(1 + (5-1+0.5)/(1+0.5)) = ln(4)
    // dls: d1=9,d2=9,d3=7,d4=8,d5=8 -> avgdl=8.2
    // score = idf * (1*2.2)/(1 + 1.2*(0.25+0.75*9/8.2))
    val idf = math.log(1.0 + 4.5 / 1.5)
    val denom = 1.0 + 1.2 * (0.25 + 0.75 * 9.0 / 8.2)
    val expected = BigDecimal(idf * 2.2 / denom).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Bm25.search(docs, "id", "text", "gradient", 5).collect()
    assert(got.length == 1)
    assert(got(0).getString(0) == "d2")
    assert(math.abs(got(0).getDouble(1) - expected) < 1e-9, s"got ${got(0).getDouble(1)} expected $expected")
  }

  test("BM25 ranking: term-stuffed doc ranks for its terms; top-k order deterministic") {
    val top = Bm25.search(docs, "id", "text", "newton raphson method", 3)
      .select("doc").as[String].collect().toSeq
    assert(top.head == "d5" || top.head == "d1") // d5 stuffs terms but is short
    assert(top.toSet.subsetOf(Set("d1", "d3", "d5")))
    // all matching docs scored: d2 matches none of the query terms
    val all = Bm25.scores(docs, "id", "text", "newton raphson method")
      .select("doc").as[String].collect().toSet
    assert(all == Set("d1", "d3", "d5"))
  }

  test("doc length + termFreq tables are exact") {
    val dl = Bm25.docLen(docs, "id", "text").as[(String, Long)].collect().toMap
    assert(dl == Map("d1" -> 9L, "d2" -> 9L, "d3" -> 7L, "d4" -> 8L, "d5" -> 8L))
    val tf = Bm25.termFreq(docs, "id", "text")
      .filter($"doc" === "d5").as[(String, String, Long)].collect()
      .map(r => r._2 -> r._3).toMap
    assert(tf == Map("newton" -> 3L, "raphson" -> 2L, "method" -> 3L))
  }

  test("index build: postings sorted, df/avgdl correct") {
    val idx = Bm25.build(docs, "id", "text")
    assert(idx.nDocs == 5)
    assert(math.abs(idx.avgdl - 8.2) < 1e-9)
    val newton = idx.postings.filter($"term" === "newton").collect()(0)
    assert(newton.getAs[Long]("df") == 3)
    val posting = newton.getSeq[org.apache.spark.sql.Row](2).map(r => (r.getString(0), r.getLong(1)))
    assert(posting == Seq(("d1", 1L), ("d3", 1L), ("d5", 3L))) // sorted by doc
  }

  test("cosine top-k: exact self-similarity first, orthogonal last") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f)),
      (4L, Array(-1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val top = Knn.topK(vecs, "vec_id", "embedding", Array(1.0f, 0.0f, 0.0f), 4)
      .select("id").as[Long].collect().toSeq
    assert(top == Seq(1L, 2L, 3L, 4L))
  }

  test("ANN buckets: identical vectors share every bucket; ann finds the twin") {
    val base = (0 until 20).map { i =>
      val rnd = new java.util.SplittableRandom(100 + i)
      (i.toLong, Array.fill(64)(rnd.nextDouble().toFloat))
    }
    val twin = Seq((99L, base(7)._2))
    val df = (base ++ twin).toDF("vec_id", "embedding")
    val ann = Knn.annTopK(df, "vec_id", "embedding", k = 1)
      .filter($"id_a" === 7L).select("id_b").as[String].collect()
    assert(ann.headOption.contains("99"))
  }

  test("ANN bucket cap bounds pair blowup on a degenerate all-identical corpus") {
    // 300 identical embeddings: every vector lands in the same bucket in
    // every table. Uncapped this is C(300,2)*tables ≈ 134k pairs; with
    // maxBucket=32 only the 32 smallest ids per bucket pair up.
    val v = {
      val rnd = new java.util.SplittableRandom(7L)
      Array.fill(64)(rnd.nextDouble().toFloat)
    }
    val df = (0 until 300).map(i => (i.toLong, v)).toDF("vec_id", "embedding")
    val out = Knn.annTopK(df, "vec_id", "embedding", k = 3, maxBucket = 32).collect()
    val queryIds = out.map(_.getString(0)).toSet
    // bucket members are retained in lexicographic id order (ids are strings)
    val retained = (0 until 300).map(_.toString).sorted.take(32).toSet
    assert(queryIds.nonEmpty && queryIds.subsetOf(retained),
      s"cap leaked: ${queryIds.size} query ids")
    assert(out.length <= 32 * 3)
  }

  test("embedding-cosine near-dup removal drops the planted twin, keeps the rest") {
    val base = (0 until 25).map { i =>
      val rnd = new java.util.SplittableRandom(500 + i)
      (i.toLong, Array.fill(64)(rnd.nextDouble().toFloat))
    }
    val twin = Seq((99L, base(4)._2)) // identical vector, larger id
    val df = (base ++ twin).toDF("vec_id", "embedding")
    val kept = Knn.dropEmbeddingNearDups(df, "vec_id", "embedding", simThreshold = 0.999)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == base.map(_._1).toSet) // twin 99 dropped, all originals kept
  }

  private def phraseOut(rows: Seq[(String, String)], phrase: String): Map[String, Long] =
    Bm25.phraseMatches(rows.toDF("id", "text"), "id", "text", phrase)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("phraseMatches: exact adjacency required, counts per doc, tokenizer-normalized") {
    val out = phraseOut(Seq(
      "p1" -> "we built a machine learning pipeline yesterday",
      "p2" -> "machine learning is not a pipeline problem",    // terms present, not adjacent
      "p3" -> "Machine, LEARNING pipeline! and machine learning pipeline again",
      "p4" -> "pipeline learning machine"),                    // reversed order
      phrase = "machine learning pipeline")
    assert(out == Map("p1" -> 1L, "p3" -> 2L))
  }

  test("phraseMatches: overlapping occurrences and repeated phrase terms") {
    // phrase 'a b a' in 'a b a b a': anchors 0 and 2 both match
    val out = phraseOut(Seq("p5" -> "a b a b a", "p6" -> "a b b a"), "a b a")
    assert(out == Map("p5" -> 2L))
  }
}
