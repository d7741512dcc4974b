package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.corpus.PageGen

/** The spark-submit CLI surface (graft.Main): every stage runnable from
  * the command line over parquet inputs — the reference user's driver
  * without writing Scala. Commands are driven through Main.run (main()
  * would stop the shared test session). */
class MainSpec extends SparkSuiteBase {
  import spark.implicits._

  test("CLI: extract -> compact pipeline -> search finds the pinned passage") {
    val base = Files.createTempDirectory("graft-cli").toString
    val pages = spark.range(300).map(i => PageGen.row(42L, i))
    pages.write.parquet(s"$base/pages")

    Main.run(spark, List("pipeline", s"$base/pages", s"$base/root", "8", "0.8"))
    // resume: identical input quiesces (covered in PipelineSpec; here the
    // CLI path itself must survive a re-run)
    Main.run(spark, List("pipeline", s"$base/pages", s"$base/root", "8", "0.8"))

    // single index root for the pipeline's lifetime (upsert-synced)
    val hits = jobs.IndexJob.search(spark, s"$base/root/index",
      "newton raphson method", 3).collect()
    assert(hits.nonEmpty)

    // standalone index + search commands over a chunk parquet with facets
    val chunks = (0 until 20)
      .map(i => (s"c$i", s"body text number $i with spark filter join table terms",
        false, if (i % 2 == 0) "en" else "de"))
      .toDF("id", "text", "is_duplicate", "lang")
    chunks.write.parquet(s"$base/chunks")
    Main.run(spark, List("index", s"$base/chunks", s"$base/idx"))
    Main.run(spark, List("compact", s"$base/idx"))
    Main.run(spark, List("search", s"$base/idx", "spark filter", "5", "lang = 'en'"))
    val filtered = jobs.IndexJob.search(spark, s"$base/idx", "spark filter", 100,
      Some("lang = 'en'")).collect()
    assert(filtered.length == 10) // only the en half matches the facet

    // ann-build / ann-search over (id, vec) parquet
    val vecs = spark.range(50).map(i => (i.toString,
      Array.tabulate(16)(d => (Hashing.mix64(i * 31 + d) >>> 12).toDouble))).toDF("id", "vec")
    vecs.write.parquet(s"$base/vecs")
    Main.run(spark, List("ann-build", s"$base/vecs", s"$base/ann", "8", "16"))
    Main.run(spark, List("ann-search", s"$base/ann", s"$base/vecs", "3", "2", "16"))
    Main.run(spark, List("ann-compact", s"$base/ann"))
    assert(jobs.AnnIndexJob.search(spark, s"$base/ann",
      spark.read.parquet(s"$base/vecs").limit(5), "id", "vec", 3, 2, 16).count() > 0)
  }

  test("CLI search: quote/backslash-bearing doc ids emit valid one-line JSON") {
    val base = Files.createTempDirectory("graft-cli-esc").toString
    // doc ids come from arbitrary user chunk tables — adversarial ids here
    val chunks = Seq(
      ("""he said "hello" \ there""", "spark filter join table terms", false),
      ("plain-id", "spark filter join table terms too", false))
      .toDF("id", "text", "is_duplicate")
    chunks.write.parquet(s"$base/chunks")
    Main.run(spark, List("index", s"$base/chunks", s"$base/idx"))

    val buf = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(buf, true, "UTF-8")) {
      Main.run(spark, List("search", s"$base/idx", "spark filter", "5"))
    }
    val line = buf.toString("UTF-8").linesIterator
      .find(_.startsWith("""{"command":"search"""")).getOrElse(fail("no search line"))
    // must parse as JSON and round-trip the adversarial id
    val parsed = spark.read.json(Seq(line).toDS())
    val docs = parsed.select(explode(col("hits")).as("h")).select("h.doc")
      .as[String].collect().toSet
    assert(docs == Set("""he said "hello" \ there""", "plain-id"), s"got $docs")
  }

  test("CLI audit and diff: contract ledger and CDC counts as one-line JSON") {
    val base = Files.createTempDirectory("graft-cli-audit").toString
    Seq((1L, "hello"), (2L, ""), (2L, "dup-id"))
      .toDF("id", "text").write.parquet(s"$base/v1")
    // unique ids for the diff side (Cdc contract)
    Seq((1L, "hello"), (2L, "")).toDF("id", "text").write.parquet(s"$base/v1u")
    Seq((1L, "hello"), (3L, "fresh"), (2L, "changed"))
      .toDF("id", "text").write.parquet(s"$base/v2")

    val buf = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(buf, true, "UTF-8")) {
      Main.run(spark, List("audit", s"$base/v1", "id", "text"))
      Main.run(spark, List("diff", s"$base/v1u", s"$base/v2", "id", s"$base/d"))
    }
    val lines = buf.toString("UTF-8").linesIterator.toSeq
    val auditLine = lines.find(_.startsWith("""{"command":"audit""""))
      .getOrElse(fail("no audit line"))
    assert(auditLine.contains(""""chk":"unique_id","metric":0.666667,"pass":false"""),
      auditLine)
    val diffLine = lines.find(_.startsWith("""{"command":"diff""""))
      .getOrElse(fail("no diff line"))
    assert(diffLine.contains(""""insert":1""") && diffLine.contains(""""update":1"""),
      diffLine)
  }
}
