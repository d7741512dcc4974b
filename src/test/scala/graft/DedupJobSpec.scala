package graft

import graft.corpus.PageGen
import graft.extract.Extract
import graft.jobs.DedupJob

/** End-to-end dedup over the generator's planted archetypes: 'dup' rows are
  * byte-identical copies of earlier articles under new urls, 'neardup' rows
  * append one sentence (FIXTURES.md §1). Keep-first is by url string order,
  * so either member of a duplicate pair may legitimately be the survivor —
  * the invariant is one survivor per cluster. */
class DedupJobSpec extends SparkSuiteBase {
  import spark.implicits._
  implicit lazy val sp: org.apache.spark.sql.SparkSession = spark

  test("pipeline dedup keeps exactly one survivor per planted duplicate cluster") {
    val n = 800L
    val seed = 42L
    val pages = spark.range(n).map(i => PageGen.row(seed, i))
    val docs = Extract.run(pages)
      .filter(d => d.err.isEmpty && d.text.nonEmpty)
      .map(d => (d.url, d.text)).toDF("url", "text")
    val inputUrls = docs.select("url").as[String].collect().toSet

    val result = DedupJob.run(spark, docs, jaccardThreshold = 0.8)
    val clean = result.clean.select("url").as[String].collect().toSet
    val droppedRows = result.dropped.collect()
    val dropped = droppedRows.map(r => r.getAs[String]("url") -> r.getAs[String]("reason")).toMap

    // exact clusters: source article + all its byte-identical 'dup' copies
    val exactClusters: Map[Long, Seq[Long]] = (0L until n)
      .filter(i => PageGen.archetype(seed, i) == "dup")
      .groupBy(i => PageGen.srcIdx(seed, i))
      .map { case (src, dups) => src -> (src +: dups) }
    exactClusters.foreach { case (src, cluster) =>
      val urls = cluster.map(PageGen.url).filter(inputUrls)
      if (urls.size > 1) {
        val survivors = urls.count(clean)
        assert(survivors == 1,
          s"cluster of src=$src: ${urls.size} members, $survivors survivors")
        urls.filterNot(clean).foreach(u =>
          assert(dropped.contains(u), s"$u dropped but unrecorded"))
      }
    }

    // near-dup pairs: source + mutated copy — at least 90% of pairs lose one
    val nearPairs = (0L until n)
      .filter(i => PageGen.archetype(seed, i) == "neardup")
      .map(i => (PageGen.srcIdx(seed, i), i))
      .filter { case (s, i) => inputUrls(PageGen.url(s)) && inputUrls(PageGen.url(i)) }
    val resolved = nearPairs.count { case (s, i) =>
      val a = clean(PageGen.url(s)); val b = clean(PageGen.url(i))
      a ^ b // exactly one survives
    }
    assert(resolved >= nearPairs.size * 9 / 10,
      s"only $resolved/${nearPairs.size} near-dup pairs resolved")

    // nothing outside the planted clusters was dropped
    val plantedUrls: Set[String] =
      (exactClusters.values.flatten ++ nearPairs.flatMap(p => Seq(p._1, p._2)))
        .map(PageGen.url).toSet
    val spurious = dropped.keySet -- plantedUrls
    assert(spurious.isEmpty, s"spuriously dropped: ${spurious.take(5)}")

    // conservation: clean + dropped == input
    assert(clean.size + dropped.size == inputUrls.size)
  }
}
