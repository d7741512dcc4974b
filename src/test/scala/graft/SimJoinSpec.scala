package graft

import graft.dedup.SimJoin

/** PPJoin exact Jaccard self-join: brute-force equality (prefix-filter
  * completeness), exact rational threshold boundaries, shingle-level
  * cross-check against the planted near-dup corpus. */
class SimJoinSpec extends SparkSuiteBase {
  import spark.implicits._

  private def join(sets: Seq[(Long, Long)], tn: Int, td: Int) =
    SimJoin.jaccardJoin(sets.toDF("id", "key"), "id", "key", tn, td)
      .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq

  test("matches the brute force over all pairs (prefix filter loses nothing)") {
    // 40 sets with structured overlaps: set i = {i..i+sz-1} over a small
    // universe so neighbours overlap heavily and far sets not at all
    val sets = for (i <- 0L until 40L; k <- 0L until (5 + i % 4)) yield (i, (i * 3 + k) % 60)
    val bySet = sets.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val want = (for {
      a <- bySet.keys; b <- bySet.keys if a < b
      inter = (bySet(a) & bySet(b)).size.toLong
      if 2L * inter >= 1L * (bySet(a).size + bySet(b).size - inter) // t = 1/2
    } yield (a, b, inter, bySet(a).size.toLong, bySet(b).size.toLong)).toSeq.sorted
    assert(join(sets, 1, 2) == want)
    assert(want.nonEmpty, "test corpus must produce matches")
  }

  test("exact rational boundary: J == t kept, J just below dropped") {
    // A={1,2,3}, B={1,2,3,4,5}: J = 3/5 exactly -> kept at t=3/5
    // C={10,11}, D={10,11,12,13}: J = 2/4 = 1/2 < 3/5 -> dropped
    val sets = Seq(1L -> 1L, 1L -> 2L, 1L -> 3L,
      2L -> 1L, 2L -> 2L, 2L -> 3L, 2L -> 4L, 2L -> 5L,
      3L -> 10L, 3L -> 11L, 4L -> 10L, 4L -> 11L, 4L -> 12L, 4L -> 13L)
    assert(join(sets, 3, 5) == Seq((1L, 2L, 3L, 3L, 5L)))
    // at t = 1/2 the second pair appears too
    assert(join(sets, 1, 2).toSet ==
      Set((1L, 2L, 3L, 3L, 5L), (3L, 4L, 2L, 2L, 4L)))
  }

  test("t = 1 degenerates to exact-set equality") {
    val sets = Seq(1L -> 7L, 1L -> 8L, 2L -> 7L, 2L -> 8L, 3L -> 7L)
    assert(join(sets, 1, 1) == Seq((1L, 2L, 2L, 2L, 2L)))
  }

  test("shingleJoin finds exactly the planted trailing-marker near-dups") {
    val docs = (0L until 30L).map { i =>
      val words = (0 until 40).map(k => s"w${(i * 7 + k * k) % 23}").mkString(" ")
      (i, words)
    }
    val planted = docs.map { case (i, t) => (i + 1000L, t + " appended trailing marker") }
    val got = SimJoin.shingleJoin((docs ++ planted).toDF("doc_id", "text"),
      "doc_id", "text", 3, 5)
      .as[(Long, Long, Long, Long, Long)].collect()
    val pairs = got.map(r => (r._1, r._2)).toSet
    // every planted pair is found (trailing mutation: J = n/(n+1) >= 3/5)
    (0L until 30L).foreach(i => assert(pairs.contains((i, i + 1000L)), i))
    // and every reported pair really passes the exact threshold
    got.foreach { case (a, b, c, na, nb) =>
      assert(5 * c >= 3 * (na + nb - c), s"($a,$b)") }
  }
}
