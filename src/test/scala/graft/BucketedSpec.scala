package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import graft.layout.Bucketed

/** Bucketed co-located join: the shuffle is paid once at WRITE time, so the
  * consuming join must plan with ZERO Exchange, and a point lookup on the
  * bucket key must prune buckets at the scan. */
class BucketedSpec extends SparkSuiteBase {
  import spark.implicits._

  private def fmt(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("co-bucketed join: zero Exchange; equals the plain shuffled join") {
    val root = Files.createTempDirectory("graft-bucketspec").toString
    val left = (0 until 400).map(i => (i.toLong % 97, s"l-$i")).toDF("k", "lv")
    val right = (0 until 250).map(i => (i.toLong % 83, s"j-$i")).toDF("j", "rv")
    spark.sql("DROP TABLE IF EXISTS graft_bspec_l")
    spark.sql("DROP TABLE IF EXISTS graft_bspec_r")
    Bucketed.write(left, "graft_bspec_l", "k", 8, s"$root/l")
    Bucketed.write(right, "graft_bspec_r", "j", 8, s"$root/r")

    // force the sort-merge path (a broadcast join has no exchange trivially)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketed.join(spark, "graft_bspec_l", "graft_bspec_r", "k", "j")
      val plan = fmt(joined)
      val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(plan).length
      assert(exchanges == 0, s"bucketed join still shuffles ($exchanges):\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")

      val got = joined.select("k", "lv", "rv").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
      val want = left.join(right, left("k") === right("j"))
        .select("k", "lv", "rv").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
      assert(got.length > 0 && got.sameElements(want))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    // point lookup on the bucket key prunes buckets at the scan. The
    // DisableUnnecessaryBucketedScan rule turns the bucketed read off for a
    // filter-only plan (no downstream op wants the partitioning), hiding the
    // pruning — force the bucketed scan to pin the capability.
    val prevAuto =
      spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    try {
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      val lookup = fmt(spark.table("graft_bspec_l").filter(col("k") === 5L))
      assert(lookup.contains("SelectedBucketsCount: 1 out of 8"),
        s"no bucket pruning in the scan:\n$lookup")
    } finally
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", prevAuto)
  }
}
