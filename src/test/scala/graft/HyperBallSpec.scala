package graft

import graft.graph.HyperBall
import graft.sketch.Hll

/** HyperBall: exact register parity with explicit BFS ball memberships
  * (the operator's registers must EQUAL HLL-of-the-true-ball at every
  * radius — the union-exactness property), directedness, multi-edge
  * insensitivity, partition invariance. */
class HyperBallSpec extends SparkSuiteBase {
  import spark.implicits._

  private def regs(edges: Seq[(Long, Long)], radius: Int, parts: Int = 4) =
    HyperBall.registers(edges.toDF("src", "dst").repartition(parts), radius)
      .as[(String, Int, Int)].collect().toSet

  /** Registers of the TRUE balls, via driver-side BFS membership. */
  private def bruteRegs(edges: Seq[(Long, Long)], radius: Int) = {
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val adj = edges.groupBy(_._1).map { case (s, es) => (s, es.map(_._2)) }
    val pairs = verts.flatMap { root =>
      var ball = Set(root)
      (0 until radius).foreach { _ =>
        ball = ball ++ ball.flatMap(u => adj.getOrElse(u, Nil))
      }
      ball.map(u => (root.toString, u.toString))
    }
    Hll.registers(pairs.toDF("root", "member"), "root", "member")
      .as[(String, Int, Int)].collect().toSet
  }

  private val path = Seq(1L -> 2L, 2L -> 3L)

  test("radius 0: every ball is the vertex itself") {
    assert(regs(path, 0) == bruteRegs(path, 0))
  }

  test("directed path: radius-1 and radius-2 balls match BFS exactly") {
    assert(regs(path, 1) == bruteRegs(path, 1))
    assert(regs(path, 2) == bruteRegs(path, 2))
    // directedness: the sink's ball never grows past itself
    val sink = regs(path, 2).filter(_._1 == "3")
    assert(sink == bruteRegs(path, 0).filter(_._1 == "3"))
  }

  test("random graph: register-exact vs BFS balls at radius 2") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(80)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
    assert(regs(edges, 2) == bruteRegs(edges, 2))
  }

  test("multi-edges and self-loops change nothing") {
    val base = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L)
    val noisy = base ++ Seq(1L -> 2L, 1L -> 2L, 2L -> 2L)
    assert(regs(noisy, 2) == regs(base, 2))
  }

  test("pure function of (edges, radius): partitioning does not matter") {
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(40)((rnd.nextInt(15).toLong, rnd.nextInt(15).toLong))
    assert(regs(edges, 2, parts = 1) == regs(edges, 2, parts = 7))
  }

  test("summary integer columns equal HLL-of-the-true-ball") {
    // ring of 10, out-edges +1/+2 -> radius-2 ball = {v..v+4} (5 nodes)
    val edges = (0L until 10L).flatMap(v => Seq(v -> ((v + 1) % 10), v -> ((v + 2) % 10)))
    val got = HyperBall.run(edges.toDF("src", "dst"), 2)
      .select("v", "present", "s_scaled", "est_milli")
      .as[(String, Long, Long, Long)].collect().toSet
    val ballPairs = (0L until 10L).flatMap(v => (0L to 4L).map(d => (v.toString, ((v + d) % 10).toString)))
    val want = Hll.estimate(ballPairs.toDF("root", "member"), "root", "member")
      .select("key", "present", "s_scaled", "est_milli")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == want)
  }

  test("driver fast-path equals the forced distributed rounds") {
    val edges = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 4L -> 2L, 1L -> 2L)
    val driver = regs(edges, 2)
    val dist = HyperBall.registers(edges.toDF("src", "dst"), 2,
        driverEdgeLimit = 0L)
      .as[(String, Int, Int)].collect().toSet
    assert(driver == dist)
  }
}
