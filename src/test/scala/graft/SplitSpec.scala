package graft

import org.apache.spark.sql.functions._
import graft.text.Sampling

/** Deterministic stratified train/val/test split — the growth-stability
  * property that distinguishes it from ratio-based randomSplit. */
class SplitSpec extends SparkSuiteBase {
  import spark.implicits._

  test("split is exhaustive, disjoint, and roughly proportioned") {
    val df = spark.range(2000).toDF("id")
    val out = Sampling.split(df, col("id"), trainPct = 80, valPct = 10)
    val bys = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bys.keySet == Set("train", "val", "test"))
    assert(bys.values.sum == 2000L)              // exhaustive + disjoint
    assert(bys("train") > 1400 && bys("val") < 400 && bys("test") < 400)
  }

  test("assignment is stable under corpus growth (no cross-split migration)") {
    val small = Sampling.split(spark.range(500).toDF("id"), col("id"), 80, 10)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val big = Sampling.split(spark.range(2000).toDF("id"), col("id"), 80, 10)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(small.forall { case (id, s) => big(id) == s })
  }

  test("degenerate percentages: all-train and all-test") {
    val df = spark.range(100).toDF("id")
    assert(Sampling.split(df, col("id"), 100, 0)
      .filter(col("split") =!= "train").count() == 0)
    assert(Sampling.split(df, col("id"), 0, 0)
      .filter(col("split") =!= "test").count() == 0)
    intercept[IllegalArgumentException](Sampling.split(df, col("id"), 95, 10))
  }

  private def kSample(rows: Seq[(Long, String)], k: Int, parts: Int = 4) =
    Sampling.sampleK(rows.toDF("id", "s").repartition(parts), col("id"), col("s"), k)
      .as[(Long, String)].collect().toSet

  test("sampleK: exactly k per stratum, the k smallest hashes, brute-parity") {
    val rows = (0L until 300L).map(i => (i, s"s${i % 3}"))
    val got = kSample(rows, 10)
    val want = rows.groupBy(_._2).flatMap { case (_, g) =>
      g.sortBy { case (id, _) =>
        (graft.Hashing.md5Long(id.toString) & Long.MaxValue, id.toString)
      }.take(10)
    }.toSet
    assert(got == want)
    assert(got.groupBy(_._2).values.forall(_.size == 10))
  }

  test("sampleK: growth-stable — new rows displace at most the largest-hash member") {
    val base = (0L until 200L).map(i => (i, "s"))
    val grown = base ++ (200L until 220L).map(i => (i, "s"))
    val a = kSample(base, 15)
    val b = kSample(grown, 15)
    // survivors of the grown sample that existed before were already members
    assert(b.filter(_._1 < 200).subsetOf(a))
  }

  test("sampleK: short strata keep everything; partitioning does not matter") {
    val rows = Seq((1L, "tiny"), (2L, "tiny")) ++ (0L until 50L).map(i => (100 + i, "big"))
    val got = kSample(rows, 5)
    assert(got.count(_._2 == "tiny") == 2 && got.count(_._2 == "big") == 5)
    assert(kSample(rows, 5, parts = 1) == kSample(rows, 5, parts = 9))
  }
}
