package graft

import org.apache.spark.sql.functions._
import graft.sketch.Kmv

/** KMV bottom-k signatures (driver gate: q_kmv). */
class KmvSpec extends SparkSuiteBase {
  import spark.implicits._

  test("kmv: jaccard estimate tracks true overlap") {
    // |A| = 2000, |B| = 2000, |A ∩ B| = 1000 → J = 1000/3000 = 1/3
    val a = (0 until 2000).map(i => ("a", s"v-$i"))
    val b = (1000 until 3000).map(i => ("b", s"v-$i"))
    val u = (a ++ b).map { case (_, v) => ("u", v) }
    val sig = Kmv.signature((a ++ b ++ u).toDF("key", "v"), "key", "v")
    val matches = sig.filter($"key" === "u")
      .join(sig.filter($"key" === "a").select($"h"), Seq("h"))
      .join(sig.filter($"key" === "b").select($"h"), Seq("h"))
      .count()
    val est = matches.toDouble / Kmv.K
    assert(math.abs(est - 1.0 / 3) < 0.12, s"est=$est matches=$matches")
  }

  test("kmv: shard merge == whole-set signature (lossless bottom-k union)") {
    val a = (0 until 700).map(i => ("k", s"x-$i")).toDF("key", "v")
    val b = (500 until 1500).map(i => ("k", s"x-$i")).toDF("key", "v")
    val whole = Kmv.signature(a.union(b), "key", "v")
      .orderBy("key", "h").collect().toSeq
    val merged = Kmv.merge(
      Kmv.signature(a, "key", "v"), Kmv.signature(b, "key", "v"))
      .orderBy("key", "h").collect().toSeq
    assert(whole == merged)
  }

  test("kmv: signature bounded at k; duplicate-insensitive; sets smaller than k kept whole") {
    val small = (0 until 40).map(i => ("s", s"y-$i")).toDF("key", "v")
    assert(Kmv.signature(small.union(small), "key", "v").count() == 40)
    val big = (0 until 5000).map(i => ("g", s"z-$i")).toDF("key", "v")
    assert(Kmv.signature(big, "key", "v").count() == Kmv.K.toLong)
  }
}
