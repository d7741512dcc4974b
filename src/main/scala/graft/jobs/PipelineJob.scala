package graft.jobs

import graft.PageRow
import graft.lake.LakeTable
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The composed production pipeline — the reference driver's
  * discover → extract → chunk → dedup → index → commit loop
  * (src/services/RAG/convert_to_embeddings.py:504-748, SURVEY.md §3.1) as
  * ONE resumable run over one pipeline root:
  *
  *   ExtractJob.run   pages → chunk lake at  root/extract   (bucket resume)
  *   DedupJob.run     chunks → clean + dropped lineage at   root/dedup
  *   IndexJob.build   clean  → BM25 segments at             root/index/g{v}
  *
  * Cross-stage resume: after dedup+index complete for extract version v,
  * the key `indexed-extract-v{v}` is committed to root/pipeline. A re-run
  * whose input produced no new extract version finds the key and skips
  * straight past both downstream stages — extract's own bucket fingerprints
  * already make stage 1 a no-op, so a fully quiesced pipeline run touches
  * only manifests (the reference's progress_store fast path).
  *
  * Index generations: each extract version indexes into a FRESH generation
  * dir (root/index/g{v}). A changed page re-extracts its bucket and may
  * REWRITE a chunk id's text; appending that as a segment would mix old and
  * new postings under one doc id (the (term,doc) max-tf overlap dedup keeps
  * the max, not the newest). Within a static or append-only corpus the
  * generation contains ordinary append segments + compaction; doc-level
  * mutation forces a new generation — the honest trade until doc
  * tombstoning exists.
  */
object PipelineJob {

  final case class Result(extractVersion: Int, indexRoot: String,
                          dedupDropped: Long, resumed: Boolean)

  private val StageKey = "indexed-extract-v(\\d+)".r

  def run(spark: SparkSession, pages: Dataset[PageRow], root: String,
          nBuckets: Int = 16, jaccardThreshold: Double = 0.8): Result = {
    val er = ExtractJob.run(spark, pages, s"$root/extract", nBuckets)
    val indexRoot = s"$root/index/g${er.version}"
    val plake = new LakeTable(s"$root/pipeline")
    val stageKey = s"indexed-extract-v${er.version}"
    val done = plake.state.keyVersions.collectFirst {
      case (k, v) if k == stageKey => v
    }
    done match {
      case Some(v) =>
        val dropped = plake.readManifest(v).metrics.getOrElse("dropped", 0.0)
        Result(er.version, indexRoot, dropped.toLong, resumed = true)
      case None =>
        // stage 2: corpus-wide dedup over the extracted chunk relation.
        // Chunk identity is (url, chunk_index) — content-stable across
        // resumed runs, joinable back to the lake, and oracle-expressible.
        val chunks = ExtractJob.readChunks(spark, s"$root/extract")
        val docs = chunks.filter(!col("is_duplicate"))
          .select(concat(col("url"), lit("#"), col("chunk_index")).as("cid"),
            col("text"))
        val dr = DedupJob.run(spark, docs, urlCol = "cid", textCol = "text",
          jaccardThreshold = jaccardThreshold)

        // dropped lineage persisted like every other loser in the system —
        // recorded, not erased; count rides the write via observe()
        val dlake = new LakeTable(s"$root/dedup")
        val dv = dlake.currentVersion + 1
        val obs = org.apache.spark.sql.Observation()
        dr.dropped.observe(obs, count(lit(1)).as("n"))
          .write.mode("overwrite").parquet(s"$root/dedup/data/v$dv/dropped")
        dlake.commit(dlake.listParquet(s"$root/dedup/data/v$dv"),
          Seq(s"dedup-extract-v${er.version}"), Nil, Map.empty)
        val nDropped = obs.get("n").asInstanceOf[Long]

        // stage 3: index the cleaned corpus, compact to one live segment.
        // The url host rides along as a committed facet so the composed
        // index supports the reference's where=-filtered retrieval
        // (question_rag.py:130-194) out of the box.
        IndexJob.build(spark,
          dr.clean.select(col("cid").as("id"), col("text"),
            lit(false).as("is_duplicate"),
            graft.text.TextAnalysis.urlHostCol(col("cid")).as("host")),
          indexRoot, facetCols = Seq("host"))
        IndexJob.compact(spark, indexRoot)

        // stage barrier: downstream stages for this extract version are done
        plake.commit(Nil, Seq(stageKey), Nil, Map("dropped" -> nDropped.toDouble))
        Result(er.version, indexRoot, nDropped, resumed = false)
    }
  }
}
