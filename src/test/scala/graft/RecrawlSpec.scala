package graft

import graft.web.Recrawl
import java.sql.Timestamp
import org.apache.spark.sql.functions._

class RecrawlSpec extends SparkSuiteBase {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  // p1: 4 visits at 0/100/200/300 s, fingerprints a,b,b,c -> n=3, x=2
  // p2: 3 visits at 0/50/100 s, all same fp -> n=2, x=0 -> lambda 0
  // p3: 1 visit -> no estimate
  private val visits = Seq(
    ("p1", ts(0), "a"), ("p1", ts(100), "b"), ("p1", ts(200), "b"), ("p1", ts(300), "c"),
    ("p2", ts(0), "s"), ("p2", ts(50), "s"), ("p2", ts(100), "s"),
    ("p3", ts(0), "z")
  ).toDF("page", "ts", "fp")

  test("hand-computed bias-corrected MLE") {
    val got = Recrawl.changeRates(visits, "page", "ts", "fp")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == Set("p1", "p2"))
    // p1: lambda = -ln((3-2+0.5)/(3+0.5)) / (300/3 s) = ln(3.5/1.5)/100
    val exp1 = BigDecimal(math.log(3.5 / 1.5) / 100.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("p1") == ((3L, 2L, exp1)), s"got ${got("p1")} want $exp1")
    assert(got("p2") == ((2L, 0L, 0.0)))
  }

  test("partition invariance and faster-changing page ranks hotter") {
    val a = Recrawl.changeRates(visits, "page", "ts", "fp")
      .orderBy("page").collect().toSeq
    val b = Recrawl.changeRates(visits.repartition(7, col("fp")), "page", "ts", "fp")
      .orderBy("page").collect().toSeq
    assert(a == b)
    val byLambda = a.sortBy(-_.getDouble(3)).map(_.getString(0))
    assert(byLambda == Seq("p1", "p2"))
  }
}
