package graft

import org.apache.spark.sql.functions._
import graft.jobs.IndexJob

/** Index-resident Block-Max WAND over the compressed blocks channel:
  * equality with search() across segments, tombstone/upsert awareness,
  * compaction carrying the channel, loud guards for partial coverage and
  * non-canonical ids. */
class IndexBmwSpec extends SparkSuiteBase {
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-ibmw").toString

  private val corpus = (0 until 120).map { i =>
    val words = Seq.fill(i % 5 + 1)("spark") ++ Seq.fill(i % 3)("join") ++
      Seq.fill(3)(s"w$i")
    (i.toString, words.mkString(" "))
  }

  private def docsDf = corpus.toDF("id", "text")
    .withColumn("is_duplicate", lit(false))

  private def fullTopK(root: String, query: String, k: Int) =
    IndexJob.search(spark, root, query, k = 1 << 20)
      .as[(String, Double)].collect()
      .sortBy { case (d, s) => (-s, d) }.take(k).toSeq

  test("pruned top-k equals search()'s rounded top-k over two segments") {
    val root = freshRoot()
    IndexJob.build(spark, docsDf.filter($"id".cast("long") < 60), root, blocks = true)
    IndexJob.build(spark, docsDf.filter($"id".cast("long") >= 60), root, blocks = true)
    val pruned = IndexJob.blockMaxTopk(spark, root, "spark join", k = 10,
      seedR = 4).as[(String, Double)].collect().toSeq
    assert(pruned == fullTopK(root, "spark join", 10))
  }

  test("tombstoned docs cannot be returned, re-appended ones can; compaction keeps the channel") {
    val root = freshRoot()
    IndexJob.build(spark, docsDf, root, blocks = true)
    val top = IndexJob.blockMaxTopk(spark, root, "spark", k = 3)
      .as[(String, Double)].collect().map(_._1)
    IndexJob.tombstone(spark, root, top.toSeq.toDF("doc"))
    val reAdd = Seq((top.head, "spark spark spark spark spark spark", false))
      .toDF("id", "text", "is_duplicate")
    IndexJob.build(spark, reAdd, root, blocks = true)
    val want = fullTopK(root, "spark", 5)
    val got = IndexJob.blockMaxTopk(spark, root, "spark", k = 5)
      .as[(String, Double)].collect().toSeq
    assert(got == want)
    assert(got.map(_._1).contains(top.head))
    assert(!got.map(_._1).exists(Set(top(1), top(2))))
    IndexJob.compact(spark, root)
    val afterCompact = IndexJob.blockMaxTopk(spark, root, "spark", k = 5)
      .as[(String, Double)].collect().toSeq
    assert(afterCompact == want)
  }

  test("a live segment without blocks fails loudly, never silently omits") {
    val root = freshRoot()
    IndexJob.build(spark, docsDf.filter($"id".cast("long") < 60), root, blocks = true)
    IndexJob.build(spark, docsDf.filter($"id".cast("long") >= 60), root) // no blocks
    val e = intercept[Exception] {
      IndexJob.blockMaxTopk(spark, root, "spark", k = 5).collect()
    }
    assert(e.getMessage.contains("lack"), e.getMessage)
  }

  test("non-canonical doc ids fail the blocks build loudly") {
    val root = freshRoot()
    val bad = Seq(("007", "spark words here", false), ("8", "more spark", false))
      .toDF("id", "text", "is_duplicate")
    val e = intercept[Exception] {
      IndexJob.build(spark, bad, root, blocks = true)
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("canonical")), msgs(e).mkString(" | "))
  }
}
