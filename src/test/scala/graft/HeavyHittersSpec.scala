package graft

import graft.sketch.HeavyHitters

/** Misra–Gries + exact recheck (driver gate: q_heavy). */
class HeavyHittersSpec extends SparkSuiteBase {
  import spark.implicits._

  private def brute(items: Seq[String], k: Int): Map[String, Long] = {
    val n = items.size.toLong
    items.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * (k + 1) > n }.toMap
  }

  private def run(items: Seq[String], k: Int, parts: Int): Map[String, Long] = {
    val df = spark.createDataset(items).repartition(parts).toDF("item")
    HeavyHitters.exact(df, "item", k)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("pinned: tiny k forces decrement churn, counts stay exact") {
    val s = Seq("a", "b", "c", "a", "b", "c", "a", "a", "a", "d", "a")
    // n=11, count(a)=5... threshold k=1: cnt*2 > 11 -> cnt >= 6
    assert(run(s, 1, 3) == Map("a" -> 6L))
    assert(run(s :+ "b", 3, 2) == brute(s :+ "b", 3))
    assert(run(Nil, 3, 1) == Map.empty[String, Long])
  }

  test("exact == brute across skewed streams, partitionings, capacities") {
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 4) {
      val items = (0 until 400).map { _ =>
        val r = rnd.nextDouble()
        s"w${math.min(19, (1.0 / (r + 0.05) - 1).toInt)}"
      }
      for (parts <- Seq(1, 5); k <- Seq(2, 9)) {
        assert(run(items, k, parts) == brute(items, k),
          s"trial=$trial parts=$parts k=$k")
      }
    }
  }

  test("summary bound: ≤ k candidates + one total row per partition") {
    val items = (0 until 500).map(i => s"x${i % 37}")
    val rows = HeavyHitters.summarize(
      spark.createDataset(items).repartition(4), 5).collect()
    val totals = rows.filter(_.isNullAt(0))
    assert(totals.length == 4 && totals.map(_.getLong(1)).sum == 500L)
    assert(rows.count(!_.isNullAt(0)) <= 4 * 5)
  }
}
