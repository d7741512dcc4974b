package graft

import graft.text.Calibrate

/** Per-domain percentile calibration (driver gate: q_calibrate). */
class CalibrateSpec extends SparkSuiteBase {
  import spark.implicits._

  test("top-q cut is per-domain: a hot-scoring domain cannot crowd out a cold one") {
    // domain a scores 90..99, domain b scores 0..9 — a GLOBAL top-half cut
    // would keep all of a and none of b; the calibrated cut keeps half of each
    val df = ((0 until 10).map(i => ("a", 90 + i, i.toLong)) ++
      (0 until 10).map(i => ("b", i, (100 + i).toLong)))
      .toDF("dom", "score", "id")
    val kept = Calibrate.percentile(df, "dom", "score", "id", 0.5)
      .filter($"keep").groupBy("dom").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // pr = (rank-1)/9 <= 0.5 -> ranks 1..5 plus rank 6 (pr=5/9=0.555>0.5? no)
    assert(kept == Map("a" -> 5L, "b" -> 5L), kept.toString)
  }

  test("pr is exact (rank-1)/(n-1) from the top; ties broken by id; singleton kept") {
    val df = Seq(("d", 5, 1L), ("d", 5, 2L), ("d", 3, 3L), ("s", 7, 9L))
      .toDF("dom", "score", "id")
    val got = Calibrate.percentile(df, "dom", "score", "id", 0.4)
      .collect().map(r => r.getLong(2) -> ((r.getDouble(3), r.getBoolean(4)))).toMap
    assert(got(1L) == ((0.0, true)))           // best (tie, lower id first)
    assert(got(2L) == ((0.5, false)))          // (2-1)/(3-1)
    assert(got(3L) == ((1.0, false)))
    assert(got(9L) == ((0.0, true)))           // singleton domain: pr=0, kept
  }
}
