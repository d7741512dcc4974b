package graft

import graft.graph.Triangles

/** Degree-oriented triangle counting (driver gate: q_triangles). */
class TrianglesSpec extends SparkSuiteBase {
  import spark.implicits._

  private def perVertex(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Triangles.perVertex(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  test("triangles: K4 has 4, every vertex in 3; a square has none until a diagonal") {
    val k4 = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L))
    assert(perVertex(k4) == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
    val square = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
    assert(perVertex(square).isEmpty)
    assert(perVertex(square :+ ((0L, 2L))) ==
      Map(0L -> 2L, 2L -> 2L, 1L -> 1L, 3L -> 1L))
  }

  test("triangles: bowtie center participates in both; hub stars have none") {
    val bowtie = Seq((0L, 1L), (1L, 2L), (2L, 0L), (0L, 3L), (3L, 4L), (4L, 0L))
    assert(perVertex(bowtie) ==
      Map(0L -> 2L, 1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
    val star = (1L to 20L).map((0L, _))
    assert(perVertex(star).isEmpty)
  }

  test("triangles: duplicate, reversed, and self-loop edges do not change counts") {
    val tri = Seq((0L, 1L), (1L, 2L), (2L, 0L))
    val noisy = tri ++ Seq((1L, 0L), (0L, 1L), (2L, 2L), (0L, 0L))
    assert(perVertex(noisy) == perVertex(tri))
  }

  test("triangles: wedge join is an equi-join, never a nested-loop cartesian") {
    val edges = (0 until 300).map(i => ((i % 60).toLong, ((i * 7 + 1) % 60).toLong))
      .toDF("a", "b")
    val plan = Triangles.perVertex(edges, "a", "b").queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"wedge join degenerated to a cartesian:\n$plan")
  }

  test("triangles: random graph matches brute-force enumeration") {
    val rnd = new scala.util.Random(13)
    val n = 40
    val edges = (0 until 220).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    val adj = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .groupBy(_._1).map { case (v, vs) => v -> vs.map(_._2).toSet }
    var expect = Map.empty[Long, Long].withDefaultValue(0L)
    for (x <- 0L until n; y <- x + 1 until n; z <- y + 1 until n)
      if (adj.getOrElse(x, Set.empty)(y) && adj.getOrElse(y, Set.empty)(z) &&
          adj.getOrElse(x, Set.empty)(z)) {
        expect = expect + (x -> (expect(x) + 1)) + (y -> (expect(y) + 1)) + (z -> (expect(z) + 1))
      }
    assert(perVertex(edges) == expect.filter(_._2 > 0))
  }
}
