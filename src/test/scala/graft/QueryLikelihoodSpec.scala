package graft

import graft.index.QueryLikelihood
import org.apache.spark.sql.functions._

class QueryLikelihoodSpec extends SparkSuiteBase {
  import spark.implicits._

  private val docs = Seq(
    ("d1", "newton raphson newton method"),
    ("d2", "gradient descent loss descent descent"),
    ("d3", "newton iteration root"),
    ("d4", "cooking pasta dinner")
  ).toDF("id", "text")

  // direct-form reference: score = Σ_{t∈q, cf>0} ln((tf + μ·cf/|C|)/(dl + μ))
  private def direct(query: Seq[String], mu: Double): Map[String, Double] = {
    val corpus = Map(
      "d1" -> Seq("newton", "raphson", "newton", "method"),
      "d2" -> Seq("gradient", "descent", "loss", "descent", "descent"),
      "d3" -> Seq("newton", "iteration", "root"),
      "d4" -> Seq("cooking", "pasta", "dinner"))
    val ctot = corpus.values.map(_.size).sum.toDouble
    val cf = query.map(t => t -> corpus.values.map(_.count(_ == t)).sum.toDouble).toMap
    val live = query.filter(cf(_) > 0)
    corpus.collect { case (d, toks) if live.exists(toks.contains) =>
      d -> live.map { t =>
        math.log((toks.count(_ == t) + mu * cf(t) / ctot) / (toks.size + mu))
      }.sum
    }
  }

  test("decomposed score == direct Dirichlet formula (4 dp), candidates only") {
    val got = QueryLikelihood.scores(docs, "id", "text", "newton descent")
      .as[(String, Double)].collect().toMap
    val expected = direct(Seq("newton", "descent"), QueryLikelihood.Mu)
    assert(got.keySet == expected.keySet) // d4 matches nothing -> absent
    for ((d, e) <- expected)
      assert(math.abs(got(d) - e) < 5e-5, s"$d: ${got(d)} vs $e")
    // more matching occurrences rank higher here (equal-length docs differ)
    assert(got("d1") > got("d3"))
  }

  test("corpus-absent query term drops from the sums instead of -inf") {
    val withOov = QueryLikelihood.scores(docs, "id", "text", "newton zzzmissing")
      .as[(String, Double)].collect().toMap
    val without = QueryLikelihood.scores(docs, "id", "text", "newton")
      .as[(String, Double)].collect().toMap
    assert(withOov == without)
  }

  test("partition invariance and top-k search ordering") {
    val a = QueryLikelihood.scores(docs, "id", "text", "newton descent")
      .orderBy("doc").as[(String, Double)].collect().toSeq
    val b = QueryLikelihood.scores(docs.repartition(5, col("id")), "id", "text", "newton descent")
      .orderBy("doc").as[(String, Double)].collect().toSeq
    assert(a == b)
    val top = QueryLikelihood.search(docs, "id", "text", "newton descent", k = 2)
      .as[(String, Double)].collect().toSeq
    assert(top == a.sortBy { case (d, s) => (-s, d) }.take(2))
  }
}
