package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.corpus.PageGen
import graft.extract.Extract
import graft.chunk.Chunker
import graft.jobs.{DedupJob, IndexJob}

/** Capstone: the full user-facing flow a reference user would run after
  * switching to this library — extract → corpus dedup → chunk → index →
  * retrieve — composed purely from the public jobs API, ending in a
  * retrieval result that provably contains the pinned passage. */
class PipelineSpec extends SparkSuiteBase {
  import spark.implicits._
  implicit lazy val sp: org.apache.spark.sql.SparkSession = spark

  test("extract -> dedup -> chunk -> index -> retrieve finds the Newton passage") {
    val n = 600L
    val idxRoot = Files.createTempDirectory("graft-pipe-idx").toString

    // 1. extraction over the Common-Crawl-style corpus (salted)
    val pages = spark.range(n).repartition(8).map(i => PageGen.row(42L, i))
    val docs = Extract.runSalted(pages, 8)
      .filter(d => d.err.isEmpty && d.text.nonEmpty)
      .map(d => (d.url, d.text)).toDF("url", "text")

    // 2. corpus-wide dedup (exact + MinHash-LSH)
    val deduped = DedupJob.run(spark, docs).clean

    // 3. chunk (reference semantics) — one row per chunk
    val chunks = deduped.as[(String, String)].flatMap { case (url, text) =>
      Chunker.chunkDocument(url, Hashing.sha256Hex(text), text)
    }.toDF()

    // 4. index as a committed segment
    IndexJob.build(spark, chunks, idxRoot)

    // 5. retrieval join over the materialized index
    val top = IndexJob.search(spark, idxRoot, "newton raphson method", 5).collect()
    assert(top.length == 5)
    assert(top.map(_.getDouble(1)).toSeq == top.map(_.getDouble(1)).sorted.reverse.toSeq)

    // the winning chunk really contains the pinned passage terms
    val winnerId = top.head.getString(0)
    val winnerText = chunks.filter(col("id") === winnerId)
      .select("text").as[String].head()
    assert(winnerText.toLowerCase.contains("newton raphson"))

    // dedup actually removed the planted duplicate pages before indexing
    assert(deduped.count() < docs.count())
  }
}
