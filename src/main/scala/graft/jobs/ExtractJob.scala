package graft.jobs

import graft.{ExtractedDoc, PageRow}
import graft.extract.Extract
import graft.chunk.Chunker
import graft.lake.LakeTable
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The end-to-end extraction job: the Spark shape of the reference's
  * `convert_to_embeddings` driver (SURVEY.md §3.1), with checkpoint resume,
  * salted skew handling, per-bucket lineage, and atomic snapshot commit.
  *
  * One run = one snapshot over the url-hash buckets not yet committed:
  *
  *   read pages → bucket by xxhash64(url) % nBuckets
  *             → anti-join committed buckets            (resume, F2/T1)
  *             → repartition by bucket                  (salting, P5)
  *             → mapPartitions extract                  (X1/X2)
  *             → flatMap chunk                          (K1-K5, D1)
  *             → write parquet → commit manifest with lineage + metrics
  *
  * Resume granularity is the bucket, not the row: a crashed run leaves
  * orphan data files but no committed manifest, so the rerun reprocesses
  * exactly the uncommitted buckets and the table stays byte-identical to a
  * single clean run (tested in LakeSpec).
  */
object ExtractJob {

  final case class Result(version: Int, docs: Long, chunks: Long, errs: Long, buckets: Seq[Int])

  def run(spark: SparkSession, pages: Dataset[PageRow], tableRoot: String,
          nBuckets: Int = 64, maxBucketsPerRun: Int = Int.MaxValue): Result = {
    import spark.implicits._
    val lake = new LakeTable(tableRoot)
    val done: Set[String] = lake.committedKeys
    val todo: Seq[Int] = (0 until nBuckets).filterNot(b => done.contains(b.toString)).take(maxBucketsPerRun)
    if (todo.isEmpty) return Result(lake.currentVersion, 0, 0, 0, Nil)

    // prune to (url, html, bucket) BEFORE the salting shuffle — the scan's
    // ReadSchema and the exchange both drop warc_ts/text/lang
    val bucketed = pages
      .select(col("url"), col("html"),
        pmod(xxhash64(col("url")), lit(nBuckets)).cast("int").as("bucket"))
      .filter(col("bucket").isin(todo: _*))

    // salted repartition: decouple extraction parallelism from input layout
    val parts = spark.sparkContext.defaultParallelism
    val salted = bucketed
      .repartition(parts, col("url"))
      .as[(String, Array[Byte], Int)]

    // Extraction feeds two consumers (chunk write + lineage/metrics agg);
    // persist so the expensive parse runs once. At production scale the
    // equivalent is materializing the extracted-docs table itself as a
    // snapshot and deriving chunks/lineage from that scan.
    val extracted: Dataset[(ExtractedDoc, Int)] = salted.mapPartitions { it =>
      it.map { case (url, html, bucket) => (Extract.extractOne(url, html), bucket) }
    }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val chunks = extracted.flatMap { case (d, bucket) =>
      if (d.err.isEmpty && d.text.nonEmpty)
        Chunker.chunkDocument(d.url, graft.Hashing.sha256Hex(d.text), d.text)
          .map(c => (c.id, c.url, c.chunk_index, c.total_chunks, c.text, c.chunk_hash,
            c.is_duplicate, c.duplicate_of_index, bucket))
      else Nil
    }.toDF("id", "url", "chunk_index", "total_chunks", "text", "chunk_hash",
      "is_duplicate", "duplicate_of_index", "bucket")

    // per-bucket lineage (the reference's per-file ledger rows,
    // progress_store.py:33-61) + an observe() metric on the same pass —
    // the Catalyst-native billing accumulator (SURVEY.md §2.7 A1,
    // reference: billing.py:53-72): collected by the listener during the
    // lineage aggregation, no extra job
    val observation = new org.apache.spark.sql.Observation(s"extract_v${lake.currentVersion + 1}")
    val docStats = extracted
      .map { case (d, b) => (b, d.url, if (d.err.nonEmpty) 1 else 0, d.n_chars.toLong) }
      .toDF("bucket", "url", "is_err", "n_chars")
      .observe(observation,
        count(lit(1)).as("obs_docs"),
        sum("is_err").as("obs_errs"),
        sum(ceil(col("n_chars") / 4)).as("obs_tokens_est"))
    val lineageRows = docStats.groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum("is_err").as("n_err"),
        min("url").as("url_lo"), max("url").as("url_hi"), sum("n_chars").as("chars"))
      .collect()
      .map { r =>
        Map(
          "bucket" -> r.getAs[Int]("bucket").toString,
          "n_docs" -> r.getAs[Long]("n_docs").toString,
          "n_err" -> r.getAs[Long]("n_err").toString,
          "url_lo" -> r.getAs[String]("url_lo"),
          "url_hi" -> r.getAs[String]("url_hi"),
          "chars" -> r.getAs[Long]("chars").toString)
      }.toSeq

    val v = lake.currentVersion + 1
    val outDir = s"$tableRoot/data/v$v"
    chunks.write.mode("overwrite").parquet(outDir)

    val nDocs = lineageRows.map(_("n_docs").toLong).sum
    val nErrs = lineageRows.map(_("n_err").toLong).sum
    val nChunks = spark.read.parquet(outDir).count()
    val files = lake.listParquet(outDir)
    // token estimate from observe(): the reference's billing tokens
    // (max(1, len//4), convert_to_embeddings.py:106-118), free-riding on the
    // lineage aggregation job
    val obs = observation.get
    val tokensEst: Double = obs.get("obs_tokens_est") match {
      case Some(l: java.lang.Long) => l.toDouble
      case Some(d: java.lang.Double) => d.toDouble
      case _ => 0.0
    }
    // commit ALL planned buckets (some may be empty of rows — still done)
    val keys = todo.map(_.toString)
    lake.commit(files, keys, lineageRows,
      Map("docs" -> nDocs.toDouble, "chunks" -> nChunks.toDouble,
          "errs" -> nErrs.toDouble, "tokens_est" -> tokensEst))
    extracted.unpersist()
    Result(v, nDocs, nChunks, nErrs, todo)
  }

  def readChunks(spark: SparkSession, tableRoot: String): DataFrame =
    new LakeTable(tableRoot).read(spark)
}
