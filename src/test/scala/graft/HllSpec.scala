package graft

import org.apache.spark.sql.functions.{col, lit}
import graft.sketch.Hll

/** HyperLogLog sketch (driver gate: q_hll). */
class HllSpec extends SparkSuiteBase {
  import spark.implicits._

  private def values(key: String, n: Int) =
    (0 until n).map(i => (key, s"$key-value-$i"))

  test("hll: estimate within published error bounds across cardinalities") {
    // σ ≈ 1.04/√256 = 6.5% for n ≫ m; linear counting covers small n.
    for (n <- Seq(100, 1000, 5000, 20000)) {
      val df = values("k", n).toDF("key", "v")
      val est = Hll.estimate(df, "key", "v").select("est").as[Double].head()
      val rel = math.abs(est - n) / n
      assert(rel < 0.2, s"n=$n est=$est rel=$rel")
    }
  }

  test("hll: duplicate-insensitive (sketch of df ∪ df == sketch of df)") {
    val df = values("k", 500).toDF("key", "v")
    val once = Hll.estimate(df, "key", "v").collect().toSeq
    val twice = Hll.estimate(df.union(df), "key", "v").collect().toSeq
    assert(once == twice)
  }

  test("hll: shard merge == whole-corpus registers (register-wise max)") {
    val a = values("k", 700).toDF("key", "v")
    // overlap with a on 200 values — merge must not double count
    val b = (500 until 1200).map(i => ("k", s"k-value-$i")).toDF("key", "v")
    val whole = Hll.registers(a.union(b), "key", "v")
      .orderBy("key", "j").collect().toSeq
    val merged = Hll.merge(
      Hll.registers(a, "key", "v"), Hll.registers(b, "key", "v"))
      .orderBy("key", "j").collect().toSeq
    assert(whole == merged)
  }

  test("hll: partitioning-invariant integer summary") {
    val df = values("x", 3000).toDF("key", "v")
    def summ(d: org.apache.spark.sql.DataFrame) =
      Hll.estimate(d, "key", "v")
        .select("key", "present", "s_scaled", "est_milli").collect().toSeq
    assert(summ(df.repartition(1)) == summ(df.repartition(17)))
  }

  test("hll: inclusion–exclusion intersection estimate tracks true overlap") {
    // |A| = 2000, |B| = 2000, |A ∩ B| = 1000 (values 1000..2000 shared)
    val a = (0 until 2000).map(i => ("a", s"v-$i")).toDF("key", "v")
    val b = (1000 until 3000).map(i => ("b", s"v-$i")).toDF("key", "v")
    val u = a.union(b).select(lit("u").as("key"), col("v"))
    val est = Hll.estimate(a.union(b).union(u), "key", "v")
      .select("key", "est").as[(String, Double)].collect().toMap
    val inter = est("a") + est("b") - est("u")
    assert(math.abs(inter - 1000.0) / 1000.0 < 0.35,
      s"inter=$inter (a=${est("a")} b=${est("b")} u=${est("u")})")
  }

  test("hll: register table bounded at M rows per key") {
    val df = values("k", 50000).toDF("key", "v")
    assert(Hll.registers(df, "key", "v").count() <= Hll.M)
  }
}
