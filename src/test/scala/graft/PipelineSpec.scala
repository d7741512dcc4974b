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

  test("PipelineJob: one composed run; re-run resumes past every stage") {
    import java.sql.Timestamp
    def page(i: Int, body: String, ts: Long = 1000L) = PageRow(s"https://p.example/d$i",
      new Timestamp(ts), corpus.HtmlGen.article(s"T$i",
        Seq(body), i % 7, Nil).getBytes("UTF-8"), "", "en")
    // the variant marker sits MID-TEXT: a differing token there touches 5
    // shingle windows (pairwise jaccard ~0.64, below the 0.8 threshold); a
    // trailing token would touch only the final window (~0.92 — above it,
    // which is exactly how the planted near-dup mutant is built)
    def body(tag: String) =
      "a sufficiently long paragraph body with plenty of words " + tag +
        " to pass the strict tier filter easily and carry the retrieval " +
        "terms spark filter join table"
    val root = Files.createTempDirectory("graft-pjob").toString
    val pages = spark.createDataset(
      (0 until 20).map(i => page(i, body(s"variant$i"))) ++
        Seq(page(100, body("variant0")),                 // exact dup of d0
            page(101, body("variant1") + " marker")))    // near-dup of d1

    val r1 = graft.jobs.PipelineJob.run(spark, pages, root,
      nBuckets = 4, jaccardThreshold = 0.8)
    assert(!r1.resumed)
    assert(r1.dedupDropped >= 2, s"dropped=${r1.dedupDropped}") // the two planted
    val hits1 = IndexJob.search(spark, r1.indexRoot, "spark filter join table", 100)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(hits1.size == 20) // 22 pages, 2 dropped as duplicates

    // dropped lineage persisted with reasons
    val dropped = spark.read.parquet(s"$root/dedup/data/v1/dropped")
    assert(dropped.filter(col("reason") === "exact_duplicate").count() == 1)
    assert(dropped.filter(col("reason") === "near_duplicate").count() == 1)

    // identical input ⇒ extract quiesces (same version), stage key found,
    // dedup+index SKIPPED — and the index still answers identically
    val r2 = graft.jobs.PipelineJob.run(spark, pages, root,
      nBuckets = 4, jaccardThreshold = 0.8)
    assert(r2.resumed && r2.extractVersion == r1.extractVersion)
    assert(r2.dedupDropped == r1.dedupDropped)
    val hits2 = IndexJob.search(spark, r2.indexRoot, "spark filter join table", 100)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(hits2 == hits1)

    // a changed page (new crawl timestamp — change detection is metadata-
    // only, like the reference's size/mtime check) invalidates its bucket:
    // new extract version, new index generation, downstream stages re-run
    val pages3 = spark.createDataset(
      (0 until 20).map(i =>
        if (i == 5) page(i, body("rewritten five now"), ts = 2000L)
        else page(i, body(s"variant$i"))) ++
        Seq(page(100, body("variant0")), page(101, body("variant1") + " marker")))
    val r3 = graft.jobs.PipelineJob.run(spark, pages3, root,
      nBuckets = 4, jaccardThreshold = 0.8)
    assert(!r3.resumed && r3.extractVersion > r1.extractVersion)
    assert(r3.indexRoot != r1.indexRoot)
    val hits3 = IndexJob.search(spark, r3.indexRoot, "rewritten five", 5)
      .collect()
    assert(hits3.nonEmpty && hits3.head.getString(0).startsWith("https://p.example/d5#"))

    // the composed index carries the url host as a committed facet
    val onHost = IndexJob.search(spark, r3.indexRoot, "spark filter join table", 100,
      facetWhere = Some("host = 'p.example'")).collect()
    assert(onHost.length == 20)
    val offHost = IndexJob.search(spark, r3.indexRoot, "spark filter join table", 100,
      facetWhere = Some("host = 'nowhere.example'")).collect()
    assert(offHost.isEmpty)
  }
}
