package graft

import graft.text.NaiveBayes
import org.apache.spark.sql.functions._

/** Multinomial NB: hand-computed smoothing arithmetic, held-out
  * classification, OOV handling, partition invariance. */
class NaiveBayesSpec extends SparkSuiteBase {
  import spark.implicits._

  test("add-one smoothing arithmetic, hand-checked") {
    val train = Seq((1L, "spam", "buy buy"), (2L, "ham", "hello"))
      .toDF("id", "label", "text")
    val (grid, priors) = NaiveBayes.train(train, "id", "text", "label")
    val test = Seq((10L, "buy")).toDF("id", "text")
    val got = NaiveBayes.score(test, "id", "text", grid, priors)
      .as[(Long, String, Double)].collect()
      .map { case (_, c, s) => c -> s }.toMap
    // V=2; spam: ln(2/4) + ln((2+1)/(2+2)) = -0.9808 → -0.98
    // ham:  ln(2/4) + ln((0+1)/(1+2)) = -1.7918 → -1.79
    assert(got == Map("spam" -> -0.98, "ham" -> -1.79))
  }

  test("held-out docs score their own class highest") {
    val train = (0 until 40).map { i =>
      val cls = if (i % 2 == 0) "tech" else "food"
      val text = if (cls == "tech") s"compiler kernel thread cache w$i"
                 else s"butter flour oven yeast w$i"
      (i.toLong, cls, text)
    }.toDF("id", "label", "text")
    val (grid, priors) = NaiveBayes.train(train, "id", "text", "label")
    val test = Seq((100L, "kernel cache compiler"), (101L, "oven butter flour"))
      .toDF("id", "text")
    val best = NaiveBayes.score(test, "id", "text", grid, priors)
      .as[(Long, String, Double)].collect()
      .groupBy(_._1).map { case (d, rows) => d -> rows.maxBy(_._3)._2 }
    assert(best == Map(100L -> "tech", 101L -> "food"))
  }

  test("docs with only out-of-vocabulary terms emit no rows") {
    val train = Seq((1L, "a", "alpha beta")).toDF("id", "label", "text")
    val (grid, priors) = NaiveBayes.train(train, "id", "text", "label")
    val test = Seq((9L, "zzz qqq")).toDF("id", "text")
    assert(NaiveBayes.score(test, "id", "text", grid, priors).count() == 0L)
  }

  test("scores are partition-invariant at 2dp") {
    val train = (0 until 30).map(i =>
      (i.toLong, s"c${i % 3}", s"tok${i % 7} tok${i % 5} tok${i % 11} shared"))
      .toDF("id", "label", "text")
    val test = (100 until 120).map(i =>
      (i.toLong, s"tok${i % 7} shared tok${i % 11}")).toDF("id", "text")
    def run(parts: Int) = {
      val (g, p) = NaiveBayes.train(train.repartition(parts), "id", "text", "label")
      NaiveBayes.score(test.repartition(parts), "id", "text", g, p)
        .as[(Long, String, Double)].collect().toSet
    }
    assert(run(1) == run(7))
  }
}
