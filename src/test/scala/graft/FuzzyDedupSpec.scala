package graft

import graft.dedup.FuzzyDedup

/** Record-linkage fuzzy dedup (driver gate: q_fuzzy_dedup). */
class FuzzyDedupSpec extends SparkSuiteBase {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], cap: Int = 10000) =
    FuzzyDedup.annotate(rows.toDF("id", "s"), "id", "s", blockCap = cap)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getBoolean(2), if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap

  test("fuzzy: case-fold exact, 1-edit and 2-edit matches; 3 edits do not") {
    val out = run(Seq(
      (1L, "alpha report"),
      (2L, "alpha reporT"),    // case-normalized distance 0
      (3L, "alpha rep0rt"),    // substitution, distance 1
      (4L, "alpha reportxyz"), // distance 3 — same block, no match
      (5L, "beta report")))    // different prefix block
    assert(out(1L) == ((false, -1L)))
    assert(out(2L) == ((true, 1L)))
    assert(out(3L) == ((true, 1L)))
    assert(out(4L) == ((false, -1L)))
    assert(out(5L) == ((false, -1L)))
  }

  test("fuzzy: adjacent length bands still pair (band >= maxDist)") {
    // len 11 → band 2, len 13 → band 3; distance 2 — the ±1 band
    // replication is what finds this pair
    val out = run(Seq((1L, "ccccccccccc"), (9L, "ccccccccccccc")))
    assert(out(9L) == ((true, 1L)))
  }

  test("fuzzy: an edit inside the blocking prefix escapes (stated trade)") {
    val out = run(Seq((1L, "alpha report"), (2L, "Xlpha report")))
    assert(out(2L) == ((false, -1L)))
  }

  test("fuzzy: numeric ids order numerically, dup_of is the minimum match") {
    val out = run(Seq((10L, "gamma title"), (2L, "gamma title"), (7L, "gamma titlee")))
    assert(out(2L) == ((false, -1L)))
    assert(out(7L) == ((true, 2L)))
    assert(out(10L) == ((true, 2L))) // min match, not nearest
  }

  test("fuzzy: block cap truncates deterministically, smallest ids survive") {
    val out = run(Seq((1L, "same text"), (2L, "same text"), (3L, "same text")),
      cap = 2)
    assert(out(2L) == ((true, 1L)))
    assert(out(3L) == ((false, -1L))) // capped out of the block — unpaired
  }
}
