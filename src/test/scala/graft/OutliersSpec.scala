package graft

import org.apache.spark.sql.functions._
import graft.text.Outliers

/** Median/MAD outlier gate (driver gate: q_outliers). */
class OutliersSpec extends SparkSuiteBase {
  import spark.implicits._

  test("MAD band is per-domain; a monster row cannot drag its own gate") {
    // domain a: lengths 10..14 plus a 10^6 monster; mean/stddev gating
    // would keep the monster's neighborhood — median/MAD drops exactly it
    val df = ((Seq(10, 11, 12, 13, 14).map(("a", _)) :+ (("a", 1000000))) ++
      Seq(500, 510, 520).map(("b", _))).toDF("dom", "len")
    val got = Outliers.madGate(df, "dom", "len", c = 3.0).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getBoolean(4)).toMap
    assert(got(("a", 1000000)) == false)
    Seq(10, 11, 12, 13, 14).foreach(v => assert(got(("a", v)), s"dropped $v"))
    Seq(500, 510, 520).foreach(v => assert(got(("b", v))))
  }

  test("median/MAD exact on even counts (integer-half interpolation)") {
    val df = Seq(("d", 1), ("d", 2), ("d", 3), ("d", 10)).toDF("dom", "len")
    val row = Outliers.madGate(df, "dom", "len", 1.0)
      .select("med", "mad").head()
    assert(row.getDouble(0) == 2.5)        // (2+3)/2
    // deviations |x-2.5| = 1.5, 0.5, 0.5, 7.5 -> median = (0.5+1.5)/2 = 1.0
    assert(row.getDouble(1) == 1.0)
  }

  test("MAD = 0 (majority-constant domain) keeps exactly the median value") {
    val df = Seq(("d", 5), ("d", 5), ("d", 5), ("d", 9)).toDF("dom", "len")
    val got = Outliers.madGate(df, "dom", "len", 3.0).collect()
      .map(r => r.getInt(1) -> r.getBoolean(4)).toMap
    assert(got(5) && !got(9))
  }
}
