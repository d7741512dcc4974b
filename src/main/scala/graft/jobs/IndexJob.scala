package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.index.Bm25
import graft.lake.LakeTable

/** Index build + retrieval over materialized tables — the reference's
  * Chroma upsert + query side rebuilt as BM25 tables
  * (SURVEY.md §2.8 R4 / §2.6 F6; reference: chroma_store.py:33-61,
  * rag_py.py:266-291).
  *
  * Build: chunk table → drop duplicate rows (F6: `filter(!is_duplicate)`,
  * reference chroma_store.py:42-43) → postings/doclen/stats parquet +
  * atomic snapshot commit. Query: read materialized postings, broadcast the
  * query terms, score, top-k — no re-tokenization of the corpus at query
  * time, which is the whole point of materializing the index at 100 TB.
  */
object IndexJob {

  def build(spark: SparkSession, chunks: DataFrame, indexRoot: String): Int = {
    val docs = chunks.filter(!col("is_duplicate"))
      .select(col("id").as("doc"), col("text"))
    val idx = Bm25.build(docs, "doc", "text")
    val lake = new LakeTable(indexRoot)
    val v = lake.currentVersion + 1
    // term-range layout: repartition by term and sort within partitions so
    // retrieval's term semi-join prunes via parquet min/max stats instead of
    // scanning every posting file (the 100-TB layout lever)
    idx.postings.repartition(col("term")).sortWithinPartitions("term")
      .write.mode("overwrite").parquet(s"$indexRoot/data/v$v/postings")
    idx.docLens.write.mode("overwrite").parquet(s"$indexRoot/data/v$v/doclen")
    val files = lake.listParquet(s"$indexRoot/data/v$v")
    lake.commit(files, Seq(s"index-v$v"), Nil,
      Map("n_docs" -> idx.nDocs.toDouble, "avgdl" -> idx.avgdl))
    v
  }

  /** Retrieval join over the materialized index (R2): query terms ⨝
    * postings on term → explode postings → per-doc BM25 sum → top-k. */
  def search(spark: SparkSession, indexRoot: String, query: String, k: Int): DataFrame = {
    import spark.implicits._
    val lake = new LakeTable(indexRoot)
    val v = lake.currentVersion
    require(v > 0, s"no committed index at $indexRoot")
    val m = lake.readManifest(v)
    val n = m.metrics("n_docs")
    val avgdl = m.metrics("avgdl")
    val postings = spark.read.parquet(s"$indexRoot/data/v$v/postings")
    val doclen = spark.read.parquet(s"$indexRoot/data/v$v/doclen")

    val qTerms = graft.dedup.MinHash.tokenize(query).distinct.toSeq.toDF("term")
    postings
      .join(broadcast(qTerms), "term")
      .select(col("term"), col("df"), explode(col("postings")).as("p"))
      .select(col("term"), col("df"), col("p.doc").as("doc"), col("p.tf").as("tf"))
      .join(doclen, "doc")
      .withColumn("idf", log(lit(1.0) + (lit(n) - col("df").cast("double") + lit(0.5)) / (col("df").cast("double") + lit(0.5))))
      .withColumn("score",
        col("idf") * (col("tf").cast("double") * (lit(Bm25.K1) + 1.0)) /
          (col("tf").cast("double") + lit(Bm25.K1) * (lit(1.0) - lit(Bm25.B) + lit(Bm25.B) * col("dl").cast("double") / lit(avgdl))))
      .groupBy("doc").agg(sum("score").as("score"))
      .orderBy(desc("score"), asc("doc"))
      .limit(k)
      .select(col("doc"), round(col("score"), 4).as("score"))
  }
}
