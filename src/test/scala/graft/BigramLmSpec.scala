package graft

import graft.text.BigramLm

/** Bigram LM: hand-checked smoothing arithmetic, OOV-context skipping,
  * word-order sensitivity (what the unigram LM cannot see), and a
  * brute-force recompute on a wider corpus. */
class BigramLmSpec extends SparkSuiteBase {
  import spark.implicits._

  private def fit(train: Seq[(Long, String)]) =
    BigramLm.train(train.toDF("id", "text"), "id", "text")

  private def scored(train: Seq[(Long, String)], test: Seq[(Long, String)]) = {
    val (c2, c1) = fit(train)
    BigramLm.score(test.toDF("id", "text"), "id", "text", c2, c1)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
  }

  test("add-one smoothing arithmetic, hand-checked") {
    // train "a b a": c2 = {(a,b):1, (b,a):1}, c1 = {a:2, b:1}, V = 2
    // test "a b c a": pairs (a,b) -> ln(2/4), (b,c) -> ln(1/3); (c,a)
    // skipped (context c OOV). score = ln .5 + ln(1/3) = -1.7918 -> -1.79
    val got = scored(Seq(1L -> "a b a"), Seq(10L -> "a b c a"))
    assert(got == Map(10L -> ((2L, -1.79))))
  }

  test("docs with no scorable pair emit no row") {
    val got = scored(Seq(1L -> "a b a"),
      Seq(10L -> "c d e", 11L -> "a", 12L -> "a b"))
    assert(got.keySet == Set(12L)) // 10: all contexts OOV; 11: no pair
  }

  test("word order changes the score for an identical bag of words") {
    val train = Seq(1L -> "the quick fox jumps the quick fox sleeps")
    val natural = scored(train, Seq(10L -> "the quick fox jumps"))(10L)
    val shuffled = scored(train, Seq(10L -> "jumps fox quick the"))(10L)
    assert(natural._2 > shuffled._2,
      s"natural $natural should outscore shuffled $shuffled")
  }

  test("matches a driver-side brute-force recompute on a wider corpus") {
    val words = Vector("alpha", "beta", "gamma", "delta", "eps")
    def text(seed: Long, n: Int): String =
      (0 until n).map(i => words(((seed * 31 + i * 17 + i * i) % 5).toInt)).mkString(" ")
    val train = (0L until 40L).map(i => i -> text(i, 12 + (i % 5).toInt))
    val test = (100L until 120L).map(i => i -> text(i * 7 + 3, 10 + (i % 4).toInt))
    // brute force
    val tok = (s: String) => s.split(" ").toSeq
    val c1 = train.flatMap(d => tok(d._2)).groupBy(identity).map { case (k, v) => k -> v.size }
    val c2 = train.flatMap(d => tok(d._2).sliding(2).map(p => (p(0), p(1))))
      .groupBy(identity).map { case (k, v) => k -> v.size }
    val v = c1.size.toDouble
    val want = test.flatMap { case (id, t) =>
      val ps = tok(t).sliding(2).filter(p => c1.contains(p(0))).toSeq
      if (ps.isEmpty) None else Some(id -> ((ps.size.toLong,
        BigDecimal(ps.map(p => math.log(c2.getOrElse((p(0), p(1)), 0) + 1.0)
          - math.log(c1(p(0)) + v)).sum)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    }.toMap
    assert(scored(train, test) == want)
  }
}
