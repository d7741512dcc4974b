package graft

import org.apache.spark.sql.functions._
import graft.sim.{Kmeans, Projection}

/** Sparse sign random projection: hash-derived matrix, fixed-point
  * integer-exact projection, shuffle-free plan. */
class ProjectionSpec extends SparkSuiteBase {
  import spark.implicits._

  test("sign matrix: deterministic, valued in {-1,0,+1}, roughly 1/6-2/3-1/6") {
    val m1 = Projection.signMatrix(16, 64)
    val m2 = Projection.signMatrix(16, 64)
    assert(m1.map(_.toSeq).toSeq == m2.map(_.toSeq).toSeq)
    val flat = m1.flatten
    assert(flat.forall(v => v == -1L || v == 0L || v == 1L))
    val n = flat.length.toDouble
    val zeros = flat.count(_ == 0L) / n
    val plus = flat.count(_ == 1L) / n
    val minus = flat.count(_ == -1L) / n
    // 1024 cells: generous bands around 2/3 and 1/6
    assert(zeros > 0.55 && zeros < 0.78, s"zeros $zeros")
    assert(plus > 0.09 && plus < 0.25, s"plus $plus")
    assert(minus > 0.09 && minus < 0.25, s"minus $minus")
  }

  test("project: exact parity with the driver-side brute force; malformed excluded") {
    val dim = 8; val k = 4
    val vecs: Seq[(Long, Array[Float])] = Seq(
      1L -> Array(0.5f, -0.25f, 0.125f, 1.0f, -1.0f, 0.0f, 0.3f, -0.7f),
      2L -> Array.tabulate(dim)(i => (i - 3) * 0.11f),
      3L -> Array.tabulate(dim)(_ => 0.0f))
    val bad: Seq[(Long, Array[Float])] =
      Seq(4L -> Array(1.0f, 2.0f), 5L -> null)
    val df = (vecs ++ bad).toDF("vec_id", "embedding")
    val got = Projection.project(df, "vec_id", "embedding", k, dim)
      .as[(Long, Int, Long)].collect().toSet
    val expected = (for {
      (id, v) <- vecs
      j <- 0 until k
    } yield {
      val y = (0 until dim).map { i =>
        Projection.sign(j, i).toLong *
          math.floor(v(i).toDouble * Kmeans.Scale).toLong
      }.sum
      (id, j, y)
    }).toSet
    assert(got == expected)
  }

  test("project: shuffle-free narrow plan (no Exchange)") {
    val df = spark.range(20)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(15)),
          i => (i.cast("double") / 16.0 - 0.5).cast("float")).as("embedding"))
    val plan = Projection.project(df, "vec_id", "embedding", k = 4, dim = 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
