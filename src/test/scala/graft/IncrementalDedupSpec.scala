package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.jobs.DedupJob

/** Lake-backed incremental exact dedup (DedupJob.incremental — driver gate
  * q_dedup_incr): batches dedup against all PRIOR committed batches, and
  * the incremental history must equal a full-corpus keep-first re-dedup. */
class IncrementalDedupSpec extends SparkSuiteBase {
  import spark.implicits._

  private def root() = Files.createTempDirectory("incr-dedup").toString

  test("three batches == global keep-first over the batch-ordered union") {
    val r = root()
    val b0 = Seq(("a1", "alpha text"), ("a2", "beta text")).toDF("url", "text")
    val b1 = Seq(("b1", "alpha text"),                  // prior dup (of a1)
                 ("b2", "gamma text"),                  // fresh
                 ("b3", "gamma text")).toDF("url", "text") // in-batch dup of b2
    val b2 = Seq(("c1", "gamma text"),                  // prior dup (of b2)
                 ("c2", "delta text")).toDF("url", "text")

    val r0 = DedupJob.incremental(spark, b0, r)
    assert(r0.clean.select("url").as[String].collect().sorted.toSeq == Seq("a1", "a2"))
    assert(r0.dropped.count() == 0)

    val r1 = DedupJob.incremental(spark, b1, r)
    assert(r1.clean.select("url").as[String].collect().sorted.toSeq == Seq("b2"))
    val d1 = r1.dropped.as[(String, String, String)].collect().sortBy(_._1)
    assert(d1.toSeq == Seq(
      ("b1", "exact_prior_duplicate", "a1"),
      ("b3", "exact_duplicate", "b2")))

    val r2 = DedupJob.incremental(spark, b2, r)
    assert(r2.clean.select("url").as[String].collect().toSeq == Seq("c2"))
    val d2 = r2.dropped.as[(String, String, String)].collect().sortBy(_._1)
    assert(d2.toSeq == Seq(("c1", "exact_prior_duplicate", "b2")))
  }

  test("prior wins beat the in-batch window: all copies report the prior url") {
    val r = root()
    DedupJob.incremental(spark, Seq(("p", "same")).toDF("url", "text"), r)
    val d = DedupJob.incremental(spark,
      Seq(("x1", "same"), ("x2", "same")).toDF("url", "text"), r)
      .dropped.as[(String, String, String)].collect().sortBy(_._1)
    // both arrivals match prior state — neither is an in-batch duplicate
    assert(d.toSeq == Seq(
      ("x1", "exact_prior_duplicate", "p"),
      ("x2", "exact_prior_duplicate", "p")))
  }

  test("re-running an already-committed batch drops every row against itself") {
    // resume semantics: the fingerprint lake IS the seen-registry, so a
    // replayed batch contributes nothing and cites its own prior ingestion
    val r = root()
    val batch = Seq(("u1", "one"), ("u2", "two")).toDF("url", "text")
    DedupJob.incremental(spark, batch, r)
    val replay = DedupJob.incremental(spark, batch, r)
    assert(replay.clean.count() == 0)
    val d = replay.dropped.as[(String, String, String)].collect().sortBy(_._1)
    assert(d.toSeq == Seq(
      ("u1", "exact_prior_duplicate", "u1"),
      ("u2", "exact_prior_duplicate", "u2")))
  }

  test("bloom-pruned prior join is bit-identical to the unpruned join") {
    // the bloom prune may only ADD false-positive prior rows to the scan;
    // the equi-join re-checks equality, so results must match exactly
    val batches = Seq(
      Seq(("a1", "alpha"), ("a2", "beta"), ("a3", "gamma")),
      Seq(("b1", "alpha"), ("b2", "delta"), ("b3", "delta")),
      Seq(("c1", "beta"), ("c2", "epsilon"), ("c3", "gamma")))
    val roots = Seq(root(), root())
    val results = roots.zip(Seq(true, false)).map { case (r, useBloom) =>
      batches.map(b => DedupJob.incremental(
        spark, b.toDF("url", "text"), r, bloom = useBloom))
    }
    results(0).zip(results(1)).foreach { case (withBloom, without) =>
      assert(withBloom.clean.select("url").as[String].collect().sorted.toSeq ==
        without.clean.select("url").as[String].collect().sorted.toSeq)
      assert(withBloom.dropped.as[(String, String, String)].collect().sortBy(_._1).toSeq ==
        without.dropped.as[(String, String, String)].collect().sortBy(_._1).toSeq)
    }
  }

  test("bloom prune reaches the prior-state scan (might_contain in the plan)") {
    val r = root()
    DedupJob.incremental(spark, Seq(("p1", "one"), ("p2", "two")).toDF("url", "text"), r)
    val res = DedupJob.incremental(spark, Seq(("q1", "one"), ("q2", "three"))
      .toDF("url", "text"), r)
    assert(res.clean.queryExecution.executedPlan.toString.contains("might_contain"),
      "prior-state scan must be bloom-pre-filtered before the join exchange")
    assert(res.clean.select("url").as[String].collect().toSeq == Seq("q2"))
  }

  test("fingerprint state stays unique per hash and grows only by survivors") {
    val r = root()
    DedupJob.incremental(spark, Seq(("a", "t1"), ("b", "t1"), ("c", "t2"))
      .toDF("url", "text"), r)
    DedupJob.incremental(spark, Seq(("d", "t2"), ("e", "t3"))
      .toDF("url", "text"), r)
    val lake = new graft.lake.LakeTable(r)
    val fps = spark.read.parquet(
      lake.state.fileVersions.map(_._1).filter(_.contains("/fps/")): _*)
    assert(fps.count() == 3) // t1(a), t2(c), t3(e)
    assert(fps.select("content_hash").distinct().count() == 3)
    assert(fps.filter(col("url").isin("b", "d")).count() == 0)
  }
}
