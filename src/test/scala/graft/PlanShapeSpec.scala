package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.ExplainMode
import graft.corpus.PageGen
import graft.extract.Extract
import graft.dedup.SimHash

/** Pins the physical-plan properties the 100-TB story depends on (the same
  * ones PLANS.md documents) so a refactor cannot silently regress them. */
class PlanShapeSpec extends SparkSuiteBase {
  import spark.implicits._

  private def fmt(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("salted extraction: scan pruned to (url, html); exactly one Exchange") {
    implicit val s = spark
    val dir = Files.createTempDirectory("graft-planshape").toString
    spark.range(50).map(i => PageGen.row(42L, i)).write.mode("overwrite").parquet(dir)
    val pages = spark.read.parquet(dir).as[PageRow]
    val plan = fmt(Extract.runSalted(pages, 4).toDF)
    assert(plan.contains("ReadSchema: struct<url:string,html:binary>"),
      s"scan not pruned before the salting shuffle:\n$plan")
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly one Exchange, got $exchanges:\n$plan")
  }

  test("SimHash near-dup plan contains no ScalaUDF (native hamming expression)") {
    val docs = Seq(("a", "the quick brown fox"), ("b", "the quick brown fox!"),
      ("c", "unrelated text entirely")).toDF("id", "text")
    val plan = fmt(SimHash.nearDupPairs(docs, "id", "text"))
    assert(!plan.contains("ScalaUDF"), s"ScalaUDF leaked into the plan:\n$plan")
  }

  test("HLL registers: map-side partial max before the (key, j) exchange; no UDF") {
    val df = (0 until 500).map(i => ("k", s"v-$i")).toDF("key", "v")
    val plan = fmt(graft.sketch.Hll.registers(df, "key", "v"))
    assert(!plan.contains("ScalaUDF"), s"ScalaUDF leaked into the plan:\n$plan")
    // partial_max under HashAggregate BEFORE the Exchange — duplicates and
    // repeat observations die on the mapper, the shuffle carries <=256/key
    assert(plan.contains("partial_max"), s"no map-side partial max:\n$plan")
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly one Exchange, got $exchanges:\n$plan")
  }

  test("CMS estimate: sketch enters the probe join as the broadcast side") {
    val corpus = (0 until 300).map(i => s"t-${i % 40}").toDF("v")
    val sk = graft.sketch.CountMin.build(corpus, "v")
    val plan = fmt(graft.sketch.CountMin.estimate(sk, Seq("t-1", "t-2").toDF("v"), "v"))
    assert(plan.contains("BroadcastHashJoin"), s"sketch join not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"sketch join sort-merged:\n$plan")
  }

  test("brute KNN stays narrow: no Exchange on the corpus side") {
    val vecs = (0 until 20).map(i => (i.toLong, Array.fill(8)(i / 20.0f))).toDF("vec_id", "embedding")
    val plan = fmt(graft.sim.Knn.topK(vecs, "vec_id", "embedding", Array.fill(8)(1.0f), 3))
    // TakeOrderedAndProject, not a global Sort+Exchange
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
