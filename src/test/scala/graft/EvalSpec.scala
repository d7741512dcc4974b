package graft

import graft.index.Eval

/** Retrieval eval metrics (driver gate: q_eval). */
class EvalSpec extends SparkSuiteBase {
  import spark.implicits._

  test("recall@k and rr per query; missed relevants stay in the denominator") {
    // q1: rel docs a(rank1), c(rank3), z(not retrieved) -> n_rel=3
    // q2: rel doc at rank 4, k=2 -> hits 0 but rr = 1/4
    // q3: nothing relevant
    val run = Seq(
      ("q1", "a", 1L), ("q1", "b", 2L), ("q1", "c", 3L),
      ("q2", "x", 1L), ("q2", "y", 2L), ("q2", "w", 3L), ("q2", "r", 4L),
      ("q3", "m", 1L)).toDF("qid", "doc", "rnk")
    val qrels = Seq(("q1", "a"), ("q1", "c"), ("q1", "z"), ("q2", "r"))
      .toDF("qid", "doc")
    val got = Eval.metrics(run, qrels, k = 2).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got("q1") == ((3L, 1L, 0.333333, 1L, 1.0)))
    assert(got("q2") == ((1L, 0L, 0.0, 4L, 0.25)))
    assert(got("q3") == ((0L, 0L, 0.0, 0L, 0.0)))
  }

  test("qrels-only query (run returned nothing) scores zero recall, not a drop") {
    val run = Seq(("q1", "a", 1L)).toDF("qid", "doc", "rnk")
    val qrels = Seq(("q1", "a"), ("q9", "zz")).toDF("qid", "doc")
    val got = Eval.metrics(run, qrels, 5).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(3)))).toMap
    assert(got("q9") == ((1L, 0.0)))
    assert(got("q1") == ((1L, 1.0)))
  }
  test("ndcg@k: hand-computed graded gains; perfect ranking scores 1; ungraded query 0") {
    def l2(x: Double) = math.log(x) / math.log(2.0)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // q1 run: a(rnk1,g=1), b(rnk2,unjudged), c(rnk3,g=3); judged-but-missed z(g=2)
    // DCG@3 = 1/log2(2) + 0 + 7/log2(4); IDCG@3 from grades (3,2,1)
    val run = Seq(
      ("q1", "a", 1L), ("q1", "b", 2L), ("q1", "c", 3L),
      ("q2", "p", 1L), ("q2", "q", 2L),
      ("q3", "m", 1L)).toDF("qid", "doc", "rnk")
    val qrels = Seq(
      ("q1", "a", 1L), ("q1", "c", 3L), ("q1", "z", 2L),
      ("q2", "p", 2L), ("q2", "q", 1L)).toDF("qid", "doc", "grade")
    val got = Eval.ndcg(run, qrels, k = 3).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val dcg1 = 1.0 / l2(2.0) + 7.0 / l2(4.0)
    val idcg1 = 7.0 / l2(2.0) + 3.0 / l2(3.0) + 1.0 / l2(4.0)
    assert(got("q1") == r6(dcg1 / idcg1), s"got ${got("q1")}")
    // q2 is ranked exactly in ideal order -> 1.0
    assert(got("q2") == 1.0)
    // q3 has no graded docs -> 0.0, never NULL
    assert(got("q3") == 0.0)
  }
  test("ap@k: hand-computed; full-relevant-prefix run scores 1; missed relevants penalize") {
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // q1: rel at rnk 1 and 3, plus missed z -> n_rel=3:
    //     AP = (1/1 + 2/3) / 3
    // q2: both retrieved docs relevant, in order -> AP = (1 + 1) / 2 = 1
    // q3: no relevant docs -> 0
    val run = Seq(
      ("q1", "a", 1L), ("q1", "b", 2L), ("q1", "c", 3L),
      ("q2", "p", 1L), ("q2", "q", 2L),
      ("q3", "m", 1L)).toDF("qid", "doc", "rnk")
    val qrels = Seq(("q1", "a"), ("q1", "c"), ("q1", "z"),
      ("q2", "p"), ("q2", "q")).toDF("qid", "doc")
    val got = Eval.avgPrecision(run, qrels, k = 10).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("q1") == r6((1.0 + 2.0 / 3.0) / 3.0), s"got ${got("q1")}")
    assert(got("q2") == 1.0)
    assert(got("q3") == 0.0)
  }
  test("err@k: hand-computed cascade; early high grade dominates; unjudged run scores 0") {
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val run = Seq(
      ("q1", "a", 1L), ("q1", "b", 2L), ("q1", "c", 3L),
      ("q2", "p", 1L), ("q2", "q", 2L),
      ("q3", "m", 1L)).toDF("qid", "doc", "rnk")
    val qrels = Seq(("q1", "a", 1L), ("q1", "c", 3L), ("q2", "q", 3L))
      .toDF("qid", "doc", "grade")
    val got = Eval.err(run, qrels, k = 10).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // q1: R1=1/8 (g=1), R2=0, R3=7/8 (g=3)
    //     ERR = 1/8 + 0 + (7/8)/3 * (1-1/8)*(1-0)
    val e1 = 1.0 / 8.0 + (7.0 / 8.0) / 3.0 * (7.0 / 8.0)
    assert(math.abs(got("q1") - e1) < 2e-6, s"got ${got("q1")} want $e1")
    // q2: rank-1 unjudged, rank-2 g=3: ERR = (7/8)/2
    assert(math.abs(got("q2") - 7.0 / 16.0) < 2e-6)
    // q3: nothing judged -> 0, never NULL or missing
    assert(got("q3") == 0.0)
    // cascade: q2's satisfying doc one rank later scores below a rank-1 g=3
    assert(got("q2") < 7.0 / 8.0)
  }
}
