package graft

import graft.index.{Bm25, Cori}
import org.apache.spark.sql.functions._

class CoriSpec extends SparkSuiteBase {
  import spark.implicits._

  // Three topical shards: physics (s1), cooking (s2), mixed (s3).
  private val docs = Seq(
    ("d1", "s1", "newton gravity orbit force gravity"),
    ("d2", "s1", "quantum field force energy"),
    ("d3", "s1", "gravity wave detector energy"),
    ("d4", "s2", "pasta sauce garlic basil dinner"),
    ("d5", "s2", "oven bread flour yeast dinner"),
    ("d6", "s3", "gravity of the pasta situation"),
    ("d7", "s3", "miscellaneous words about nothing")
  ).toDF("id", "shard", "text")

  test("hand-computed belief: one topical term, three shards") {
    // query 'gravity': df s1=2, s2=0, s3=1. cw: s1=13, s2=10, s3=9
    // (avg_cw = 32/3). S=3, cf=2.
    val s = 3.0; val cf = 2.0; val avgcw = 32.0 / 3.0
    def belief(df: Double, cw: Double): Double = {
      val t = df / (df + 50.0 + 150.0 * cw / avgcw)
      val i = math.log((s + 0.5) / cf) / math.log(s + 1.0)
      0.4 + 0.6 * t * i
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Cori.rankShards(docs, "id", "text", "shard", "gravity")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got("s1") == ((13L, r6(belief(2.0, 13.0)))))
    assert(got("s3") == ((9L, r6(belief(1.0, 9.0)))))
    // df = 0 falls to the 0.4 default belief exactly
    assert(got("s2") == ((10L, 0.4)))
  }

  test("multi-term score is the mean belief; absent-everywhere term adds the default") {
    // 'gravity dinner nosuchterm': the unseen term has cf=0 -> every
    // shard takes 0.4 for it (T=0 guards the cf floor).
    val one = Cori.rankShards(docs, "id", "text", "shard", "gravity")
      .select("shard", "score").as[(String, Double)].collect().toMap
    val dinner = Cori.rankShards(docs, "id", "text", "shard", "dinner")
      .select("shard", "score").as[(String, Double)].collect().toMap
    val all = Cori.rankShards(docs, "id", "text", "shard", "gravity dinner nosuchterm")
      .select("shard", "score").as[(String, Double)].collect().toMap
    for (sh <- Seq("s1", "s2", "s3")) {
      val expected = (one(sh) + dinner(sh) + 0.4) / 3.0
      assert(math.abs(all(sh) - expected) < 2e-6, s"$sh: ${all(sh)} vs $expected")
    }
  }

  test("topical shards rank first; partitioning does not matter") {
    val base = Cori.rankShards(docs, "id", "text", "shard", "gravity energy")
      .orderBy(desc("score"), asc("shard")).select("shard").as[String].collect()
    assert(base.head == "s1") // both terms live there
    val repart = Cori.rankShards(docs.repartition(7, col("id")),
        "id", "text", "shard", "gravity energy")
      .orderBy(desc("score"), asc("shard")).select("shard").as[String].collect()
    assert(base.toSeq == repart.toSeq)
  }

  test("merged search, m=1: weight degenerates to 1 — equals the shard's own BM25") {
    val got = Cori.mergedSearch(docs, "id", "text", "shard", "gravity energy", m = 1, k = 5)
      .select("doc", "score").as[(String, Double)].collect().toSeq
    val expected = Bm25.scores(docs.filter(col("shard") === "s1"), "id", "text", "gravity energy")
      .orderBy(desc("score"), asc("doc")).limit(5)
      .as[(String, Double)].collect().toSeq
    assert(got == expected && got.nonEmpty)
  }

  test("merged search applies the belief weight per shard") {
    val ranks = Cori.rankShards(docs, "id", "text", "shard", "gravity energy")
      .select("shard", "score").as[(String, Double)].collect().toMap
    val sel = ranks.keys.toSeq.sortBy(s => (-ranks(s), s)).take(2)
    val rbar = sel.map(ranks).sum / 2.0
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = sel.flatMap { sh =>
      val w = 1.0 + 0.4 * (ranks(sh) - rbar) / rbar
      Bm25.scoredAll(docs.filter(col("shard") === sh), "id", "text", "gravity energy")
        .collect().map(r => (r.getString(0), sh, r4(r.getDouble(1) * w)))
    }.sortBy { case (d, _, s) => (-s, d) }.take(5)
    val got = Cori.mergedSearch(docs, "id", "text", "shard", "gravity energy", m = 2, k = 5)
      .as[(String, String, Double)].collect().toSeq
    assert(got == expected, s"got $got expected $expected")
  }

  test("token-empty corpus: mergedSearch degrades to empty like search") {
    val empty = docs.filter(col("id") === "nope")
    assert(Cori.mergedSearch(empty, "id", "text", "shard", "gravity", 2, 5).count() == 0L)
    assert(Cori.search(empty, "id", "text", "shard", "gravity", 2, 5).count() == 0L)
  }

  test("selective search == BM25 over the manually-selected subset") {
    val got = Cori.search(docs, "id", "text", "shard", "gravity energy", m = 1, k = 5)
      .as[(String, Double)].collect().toSeq
    val expected = Bm25.scores(docs.filter(col("shard") === "s1"), "id", "text", "gravity energy")
      .orderBy(desc("score"), asc("doc")).limit(5)
      .as[(String, Double)].collect().toSeq
    assert(got == expected && got.nonEmpty)
  }
}
