package graft

import java.nio.file.Files
import graft.lake.LakeTable
import graft.jobs.ExtractJob
import graft.corpus.PageGen
import org.apache.spark.sql.functions._

class LakeSpec extends SparkSuiteBase {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-lake").toString

  test("commit is atomic: reader sees nothing before hint, everything after") {
    val root = tmpDir()
    val lake = new LakeTable(root)
    assert(lake.currentVersion == 0)
    assert(lake.dataFiles.isEmpty)
    // write data files but don't commit — invisible
    val dir = s"$root/data/v1"
    Seq(("a", 1), ("b", 2)).toDF("k", "v").write.parquet(dir)
    assert(new LakeTable(root).dataFiles.isEmpty)
    // commit → visible, with lineage + metrics in the same manifest
    lake.commit(lake.listParquet(dir), Seq("0", "1"),
      Seq(Map("bucket" -> "0", "n_docs" -> "2")), Map("docs" -> 2.0))
    val again = new LakeTable(root)
    assert(again.currentVersion == 1)
    assert(again.read(spark).count() == 2)
    val m = again.readManifest(1)
    assert(m.keys == Seq("0", "1"))
    assert(m.lineage.head("n_docs") == "2")
    assert(m.metrics("docs") == 2.0)
  }

  test("multi-snapshot append + committedKeys accumulate") {
    val root = tmpDir()
    val lake = new LakeTable(root)
    Seq(("a", 1)).toDF("k", "v").write.parquet(s"$root/data/v1")
    lake.commit(lake.listParquet(s"$root/data/v1"), Seq("0"), Nil, Map.empty)
    Seq(("b", 2)).toDF("k", "v").write.parquet(s"$root/data/v2")
    lake.commit(lake.listParquet(s"$root/data/v2"), Seq("1"), Nil, Map.empty)
    assert(new LakeTable(root).committedKeys == Set("0", "1"))
    assert(new LakeTable(root).read(spark).count() == 2)
  }

  test("ExtractJob end-to-end: run, resume processes only the complement, final table identical to clean run") {
    val n = 120
    val pages = spark.range(n).map(i => PageGen.row(42L, i))

    // clean single run
    val cleanRoot = tmpDir()
    val clean = ExtractJob.run(spark, pages, cleanRoot, nBuckets = 8)
    assert(clean.docs == n)
    assert(clean.buckets.sorted == (0 until 8))

    // crashed run: only 3 buckets committed, then "crash"
    val root = tmpDir()
    val first = ExtractJob.run(spark, pages, root, nBuckets = 8, maxBucketsPerRun = 3)
    assert(first.buckets == Seq(0, 1, 2))
    val mid = new LakeTable(root)
    assert(mid.committedKeys == Set("0", "1", "2"))

    // resume: processes exactly the complement
    val second = ExtractJob.run(spark, pages, root, nBuckets = 8)
    assert(second.buckets == Seq(3, 4, 5, 6, 7))
    assert(first.docs + second.docs == n)

    // third run: nothing left to do
    val third = ExtractJob.run(spark, pages, root, nBuckets = 8)
    assert(third.docs == 0 && third.buckets.isEmpty)

    // final chunk table byte-identical to the clean run (T1 semantics)
    val a = ExtractJob.readChunks(spark, cleanRoot)
      .select("id", "url", "chunk_index", "text", "chunk_hash", "is_duplicate", "duplicate_of_index")
      .orderBy("url", "chunk_index").collect().toSeq
    val b = ExtractJob.readChunks(spark, root)
      .select("id", "url", "chunk_index", "text", "chunk_hash", "is_duplicate", "duplicate_of_index")
      .orderBy("url", "chunk_index").collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("lineage rows cover all processed buckets with doc counts") {
    val root = tmpDir()
    val pages = spark.range(60).map(i => PageGen.row(42L, i))
    ExtractJob.run(spark, pages, root, nBuckets = 4)
    val m = new LakeTable(root).readManifest(1)
    assert(m.lineage.map(_("n_docs").toLong).sum == 60)
    assert(m.metrics("docs") == 60.0)
    assert(m.metrics("errs") >= 0.0)
  }
}
