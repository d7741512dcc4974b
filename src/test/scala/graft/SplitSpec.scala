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
}
