package graft

import graft.text.Spell

/** SymSpell suggestion: brute-force distance-1 equality, frequency rank
  * and tie order, the k cut, self-match, plan shape. */
class SpellSpec extends SparkSuiteBase {
  import spark.implicits._

  private val docs = Seq(
    "hash hash hash fast fast sort merge",
    "fast hash sort sort sort line scan",
    "spark spark filter join table scan scan").map(Tuple1(_))

  private def got(query: String, k: Int = 3) =
    Spell.suggest(docs.toDF("text"), "text", query, k)
      .as[(String, String, Long, Long)].collect() // qterm, term, cnt, rank
      .map(r => (r._1, r._4, r._2, r._3)).sorted.toSeq

  test("matches brute-force levenshtein<=1 over the vocab, ranked by (cnt DESC, term)") {
    val vocab = docs.flatMap(_._1.split(" ")).groupBy(identity)
      .map { case (t, xs) => t -> xs.size.toLong }
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val q = Seq("fash", "sor", "spark", "zzz")
    val want = q.flatMap { qt =>
      vocab.toSeq.filter { case (t, _) => lev(t, qt) <= 1 }
        .sortBy { case (t, c) => (-c, t) }.take(3).zipWithIndex
        .map { case ((t, c), i) => (qt, i + 1L, t, c) }
    }.sorted
    assert(got("fash sor spark zzz") == want)
    // and the interesting case really has two neighbors, hash before fast
    assert(want.filter(_._1 == "fash").map(_._3) == Seq("hash", "fast"))
  }

  test("the k cut and WindowGroupLimit plan") {
    val many = (0 until 50).map(i => Tuple1(s"word$i word$i plus"))
    val df = Spell.suggest(many.toDF("text"), "text", "wordx", k = 5)
    assert(df.count() == 5)
    assert(df.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
  }
}
