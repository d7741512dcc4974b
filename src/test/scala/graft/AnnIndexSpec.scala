package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.jobs.AnnIndexJob
import graft.sim.Knn

/** Materialized IVF index (AnnIndexJob) vs the in-memory operator
  * (Knn.ivfTopK): both are deterministic by construction, so the committed
  * path must reproduce the in-memory path exactly — including across
  * appended segments sharing the first build's centroids. */
class AnnIndexSpec extends SparkSuiteBase {
  import spark.implicits._

  private val dim = 16
  private lazy val emb = {
    val d = dim // local copy: the closure must not capture the suite class
    spark.range(200).map(i => (i,
      Array.tabulate(d)(k => (Hashing.mix64(i * 131 + k) >>> 11).toDouble / (1L << 53).toDouble - 0.5)
    )).toDF("id", "v")
  }

  private def collectRanked(df: org.apache.spark.sql.DataFrame): Seq[(String, String, Double, Int)] =
    df.select(col("qid").cast("string"), col("id").cast("string"), col("cosine"), col("rank"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4)).toSeq

  test("materialized search == in-memory ivfTopK; two appended segments == one build") {
    val queries = emb.filter(col("id") < 5)
    val expected = collectRanked(
      Knn.ivfTopK(emb, queries, "id", "v", k = 3, nCells = 8, nProbe = 2, dim = dim))
    assert(expected.nonEmpty)

    val single = Files.createTempDirectory("annidx-one").toString
    AnnIndexJob.build(spark, emb, "id", "v", single, nCells = 8, dim = dim)
    assert(collectRanked(AnnIndexJob.search(spark, single, queries, "id", "v",
      k = 3, nProbe = 2, dim = dim)) == expected)

    // append path: first segment holds the smallest ids (training set),
    // second segment appends the rest under the SAME centroids
    val split = Files.createTempDirectory("annidx-two").toString
    AnnIndexJob.build(spark, emb.filter(col("id") < 100), "id", "v", split, nCells = 8, dim = dim)
    AnnIndexJob.build(spark, emb.filter(col("id") >= 100), "id", "v", split, nCells = 8, dim = dim)
    assert(collectRanked(AnnIndexJob.search(spark, split, queries, "id", "v",
      k = 3, nProbe = 2, dim = dim)) == expected)
  }

  test("compaction: merged cells search-identical; later appends still work") {
    val queries = emb.filter(col("id") < 5)
    val root = Files.createTempDirectory("annidx-cmp").toString
    // three appended segments under shared centroids
    AnnIndexJob.build(spark, emb.filter(col("id") < 80), "id", "v", root, nCells = 8, dim = dim)
    AnnIndexJob.build(spark, emb.filter(col("id") >= 80 && col("id") < 140), "id", "v",
      root, nCells = 8, dim = dim)
    AnnIndexJob.build(spark, emb.filter(col("id") >= 140), "id", "v", root, nCells = 8, dim = dim)
    val before = collectRanked(AnnIndexJob.search(spark, root, queries, "id", "v",
      k = 3, nProbe = 2, dim = dim))
    val cv = AnnIndexJob.compact(spark, root)
    assert(cv == 4)
    val after = collectRanked(AnnIndexJob.search(spark, root, queries, "id", "v",
      k = 3, nProbe = 2, dim = dim))
    assert(after == before, "compaction changed ANN search results")
    // the merged segment is the ONLY live one: exactly one cells dir feeds
    // the post-compaction union (bounded-segment-count property)
    val lake = new graft.lake.LakeTable(root)
    val liveCellDirs = lake.state.fileVersions.map(_._1)
      .filter(_.contains("/cells/"))
      .map(_.replaceAll("/cells/.*$", "")).distinct
    assert(liveCellDirs.exists(_.endsWith(s"/v$cv")))
    // a segment appended AFTER compaction participates again
    val extra = Seq((500L, Array.tabulate(dim)(k =>
      (Hashing.mix64(500L * 131 + k) >>> 11).toDouble / (1L << 53).toDouble - 0.5)))
      .toDF("id", "v")
    AnnIndexJob.build(spark, extra, "id", "v", root, nCells = 8, dim = dim)
    val withExtra = AnnIndexJob.search(spark, root, queries, "id", "v",
      k = 200, nProbe = 8, dim = dim)
    assert(withExtra.filter(col("id") === "500").count() > 0)
  }

  test("tombstones: vector delete + same-id upsert == fresh index; purge at compact") {
    val queries = emb.filter(col("id") < 5)
    // nProbe = all cells → exhaustive probing; k past the corpus → the FULL
    // ranked relation is compared, not a top-k sliver
    def ranked(root: String) = collectRanked(AnnIndexJob.search(spark, root,
      queries, "id", "v", k = 250, nProbe = 8, dim = dim))

    val root = Files.createTempDirectory("annidx-tomb").toString
    AnnIndexJob.build(spark, emb, "id", "v", root, nCells = 8, dim = dim)
    // DELETE id 150; UPSERT id 100 with its negated vector (both outside
    // the 8 smallest training ids, so centroids stay comparable to a
    // fresh build over the updated corpus)
    AnnIndexJob.tombstone(spark, root, Seq("150").toDF("id"))
    AnnIndexJob.tombstone(spark, root, Seq("100").toDF("id"))
    AnnIndexJob.build(spark,
      emb.filter(col("id") === 100)
        .withColumn("v", transform(col("v"), x => -x)),
      "id", "v", root, nCells = 8, dim = dim)

    val freshRoot = Files.createTempDirectory("annidx-tomb-ref").toString
    val updated = emb.filter(col("id") =!= 150)
      .withColumn("v",
        when(col("id") === 100, transform(col("v"), x => -x)).otherwise(col("v")))
    AnnIndexJob.build(spark, updated, "id", "v", freshRoot, nCells = 8, dim = dim)
    val want = ranked(freshRoot)
    assert(ranked(root) == want, "upserted index != fresh build over updated corpus")
    assert(!want.exists(_._2 == "150")) // the delete is visible in the relation

    // compaction purges dead rows + retires markers; relation unchanged
    AnnIndexJob.compact(spark, root)
    assert(ranked(root) == want, "compaction changed the upserted relation")
  }

  test("facet filter: search restricted to matching metadata; survives compaction and upsert") {
    val d = dim
    val labeled = emb.withColumn("lab", (col("id") % 3).cast("int"))
    val queries = emb.filter(col("id") < 5)
    // exhaustive probing + k past the corpus: the FULL filtered relation
    def ranked(root: String) = collectRanked(AnnIndexJob.search(spark, root,
      queries, "id", "v", k = 250, nProbe = 8, dim = d,
      facetWhere = Some("lab = 1")))

    val root = Files.createTempDirectory("annidx-fac").toString
    AnnIndexJob.build(spark, labeled.filter(col("id") < 100), "id", "v", root,
      nCells = 8, dim = d, facetCols = Seq("lab"))
    AnnIndexJob.build(spark, labeled.filter(col("id") >= 100), "id", "v", root,
      nCells = 8, dim = d, facetCols = Seq("lab"))
    val got = ranked(root)
    assert(got.nonEmpty)
    // every returned id matches the predicate; relation == brute filtered rank
    assert(got.forall(t => t._2.toLong % 3 == 1))
    val brute = collectRanked(
      Knn.ivfTopK(emb, queries, "id", "v", k = 250, nCells = 8, nProbe = 8, dim = d)
    ).filter(t => t._2.toLong % 3 == 1)
      .groupBy(_._1).flatMap { case (_, rs) =>
        rs.sortBy(_._4).zipWithIndex.map { case ((q, i, c, _), r) => (q, i, c, r + 1) }
      }.toSeq.sortBy(t => (t._1, t._4))
    assert(got == brute, "facet-filtered search != brute filtered ranking")

    AnnIndexJob.compact(spark, root)
    assert(ranked(root) == got, "compaction changed the facet-filtered relation")

    // upsert id 100 into the lab=1 class (100 % 3 == 1 already — change its
    // vector instead and confirm the newest facet row + vector win)
    AnnIndexJob.tombstone(spark, root, Seq("100").toDF("id"))
    AnnIndexJob.build(spark,
      labeled.filter(col("id") === 100).withColumn("v", transform(col("v"), x => -x)),
      "id", "v", root, nCells = 8, dim = d, facetCols = Seq("lab"))
    val afterUpsert = ranked(root)
    assert(afterUpsert.exists(_._2 == "100"))
    assert(afterUpsert != got) // the negated vector moved id 100's ranks
  }

  test("wrong-dim vectors are skipped at build and search, not failures") {
    val poisoned = emb.unionByName(
      Seq((900L, Array(1.0, 2.0))).toDF("id", "v")) // dim 2 row
    val root = Files.createTempDirectory("annidx-bad").toString
    AnnIndexJob.build(spark, poisoned, "id", "v", root, nCells = 8, dim = dim)
    val out = AnnIndexJob.search(spark, root,
      poisoned.filter(col("id") === 0 || col("id") === 900), "id", "v",
      k = 3, nProbe = 2, dim = dim)
    val qids = out.select("qid").distinct().as[String].collect().toSet
    assert(qids == Set("0")) // the malformed query emitted no probes
    assert(!out.select("id").as[String].collect().contains("900"))
  }
}
