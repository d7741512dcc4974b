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

  test("shortlistTopK: parity with driver-side two-stage brute force; partition-invariant") {
    val dim = 8; val kProj = 4; val shortlist = 8; val k = 3; val nQ = 3
    val vecs: Seq[(Long, Array[Float])] = (0L until 30L).map { id =>
      id -> Array.tabulate(dim)(i => (((id * 7 + i * 3) % 13) - 6) * 0.1f)
    }
    val bad: Seq[(Long, Array[Float])] =
      Seq(90L -> Array(1.0f), 91L -> null)
    val df = (vecs ++ bad).toDF("vec_id", "embedding")

    val p: Map[Long, Array[Long]] = vecs.map { case (id, v) =>
      id -> v.map(x => math.floor(x.toDouble * Kmeans.Scale).toLong)
    }.toMap
    val proj: Map[Long, Array[Long]] = p.map { case (id, q) =>
      id -> Array.tabulate(kProj)(j =>
        (0 until dim).map(i => Projection.sign(j, i).toLong * q(i)).sum)
    }
    val expected = (for {
      qid <- vecs.map(_._1) if qid < nQ
      pdists = vecs.map(_._1).filter(_ != qid).map { id =>
        (id, (0 until kProj).map { j =>
          val d = proj(id)(j) - proj(qid)(j); d * d }.sum)
      }.sortBy(t => (t._2, t._1)).take(shortlist)
      ranked = pdists.map { case (id, _) =>
        (id, (0 until dim).map { i =>
          val d = p(id)(i) - p(qid)(i); d * d }.sum)
      }.sortBy(t => (t._2, t._1)).take(k).zipWithIndex
      ((id, ed), r) <- ranked
    } yield (qid, id, ed, r + 1)).toSet

    val got = Projection.shortlistTopK(df, "vec_id", "embedding",
        k, kProj, dim, shortlist, nQ)
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(got == expected)
    val got7 = Projection.shortlistTopK(df.repartition(7), "vec_id",
        "embedding", k, kProj, dim, shortlist, nQ)
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(got7 == expected)
  }

  test("shortlistTopK: shortlist window runs as WindowGroupLimit (map-side pre-cap)") {
    val df = spark.range(40)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(15)),
          i => ((i + col("id")).cast("double") / 16.0 - 0.5).cast("float"))
          .as("embedding"))
    val plan = Projection.shortlistTopK(df, "vec_id", "embedding",
        k = 3, kProj = 4, dim = 16, shortlist = 8, nQueries = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
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
