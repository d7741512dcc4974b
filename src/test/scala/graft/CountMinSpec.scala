package graft

import org.apache.spark.sql.functions._
import graft.sketch.CountMin

/** Count-Min sketch (driver gate: q_cms). */
class CountMinSpec extends SparkSuiteBase {
  import spark.implicits._

  // zipfish corpus: term i appears (200 - i) times, i in 0..99
  private def corpus = (0 until 100).flatMap(i =>
    Seq.fill(200 - i)(s"term-$i")).toDF("v")

  test("cms: never undercounts; overcount bounded by eps*N on this corpus") {
    val sk = CountMin.build(corpus, "v")
    val exact = corpus.groupBy("v").agg(count(lit(1)).as("exact"))
    val joined = CountMin.estimate(sk, exact.select("v"), "v")
      .join(exact, "v")
      .select($"v", $"est", $"exact").as[(String, Long, Long)].collect()
    val n = corpus.count()
    val epsN = math.ceil(math.E / CountMin.W * n).toLong
    joined.foreach { case (v, est, ex) =>
      assert(est >= ex, s"$v undercounted: $est < $ex")
      assert(est - ex <= math.max(epsN, 1), s"$v overcount ${est - ex} > $epsN")
    }
  }

  test("cms: shard merge == whole-corpus build (counter-wise sum)") {
    val a = corpus.filter(length($"v") % 2 === 0)
    val b = corpus.filter(length($"v") % 2 =!= 0)
    val whole = CountMin.build(corpus, "v").orderBy("r", "b").collect().toSeq
    val merged = CountMin.merge(CountMin.build(a, "v"), CountMin.build(b, "v"))
      .orderBy("r", "b").collect().toSeq
    assert(whole == merged)
  }

  test("cms: sketch bounded at d*w rows; weighted build honors weights") {
    val sk = CountMin.build(corpus, "v")
    assert(sk.count() <= (CountMin.D * CountMin.W).toLong)
    val weighted = CountMin.build(
      Seq(("x", 5L), ("x", 7L)).toDF("v", "w"), "v", col("w"))
    val est = CountMin.estimate(weighted, Seq("x").toDF("v"), "v")
      .select("est").as[Long].head()
    assert(est == 12L)
  }

  test("cms: partitioning-invariant") {
    def run(d: org.apache.spark.sql.DataFrame) =
      CountMin.build(d, "v").orderBy("r", "b").collect().toSeq
    assert(run(corpus.repartition(1)) == run(corpus.repartition(13)))
  }
}
