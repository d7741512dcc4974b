package graft

import org.apache.spark.sql.functions._
import graft.jobs.IndexJob

/** Index-resident MaxScore: equality with full index search top-k across
  * segments, tombstone awareness, plan shape. */
class IndexMaxScoreSpec extends SparkSuiteBase {
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-imaxscore").toString

  private val corpus = (0 until 120).map { i =>
    val words = Seq.fill(i % 5 + 1)("spark") ++ Seq.fill(i % 3)("join") ++
      Seq.fill(3)(s"w$i")
    (f"d$i%03d", words.mkString(" "))
  }

  private def docsDf = corpus.toDF("id", "text")
    .withColumn("is_duplicate", lit(false))

  test("pruned top-k equals search()'s rounded top-k over two segments") {
    val root = freshRoot()
    IndexJob.build(spark, docsDf.filter($"id" < "d060"), root)
    IndexJob.build(spark, docsDf.filter($"id" >= "d060"), root)
    val full = IndexJob.search(spark, root, "spark join", k = 1 << 20)
      .as[(String, Double)].collect()
      .sortBy { case (d, s) => (-s, d) }.take(10).toSeq
    val pruned = IndexJob.topkSearch(spark, root, "spark join", k = 10, seedR = 4)
      .as[(String, Double)].collect().toSeq
    assert(pruned == full)
  }

  test("tombstoned docs cannot be returned, re-appended ones can") {
    val root = freshRoot()
    IndexJob.build(spark, docsDf, root)
    // kill the strongest spark docs; re-append one with fresh text
    val top = IndexJob.topkSearch(spark, root, "spark", k = 3).as[(String, Double)]
      .collect().map(_._1)
    IndexJob.tombstone(spark, root, top.toSeq.toDF("doc"))
    val reAdd = Seq((top.head, "spark spark spark spark spark spark", false))
      .toDF("id", "text", "is_duplicate")
    IndexJob.build(spark, reAdd, root)
    val got = IndexJob.topkSearch(spark, root, "spark", k = 5).as[(String, Double)]
      .collect().map(_._1).toSet
    assert(got.contains(top.head))            // re-appended incarnation lives
    assert(!got.contains(top(1)) && !got.contains(top(2))) // killed stay dead
  }

  test("the seed leg plans as WindowGroupLimit") {
    val root = freshRoot()
    IndexJob.build(spark, docsDf, root)
    val df = IndexJob.topkSearch(spark, root, "spark", k = 5, seedR = 5)
    assert(df.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
  }
}
