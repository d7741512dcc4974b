package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import graft.lake.{Cdc, LakeTable}

/** Snapshot change-data capture (driver gate: q_cdc). */
class CdcSpec extends SparkSuiteBase {
  import spark.implicits._

  private def ops(rows: Array[org.apache.spark.sql.Row]): Map[Long, String] =
    rows.map(r => r.getLong(0) -> r.getString(r.length - 1)).toMap

  test("insert / update / delete / unchanged classified exactly") {
    val old = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L))
      .toDF("id", "text", "meta")
    val neu = Seq((1L, "a", 10L),            // unchanged
        (2L, "B!", 20L),                     // text changed
        (3L, "c", 31L),                      // meta changed
        (5L, "e", 50L))                      // new; 4 deleted
      .toDF("id", "text", "meta")
    val got = ops(Cdc.diff(old, neu, Seq("id"), Seq("text", "meta")).collect())
    assert(got == Map(2L -> "update", 3L -> "update", 4L -> "delete", 5L -> "insert"))
  }

  test("null compare values: null==null is unchanged, null->value is update") {
    val old = Seq((1L, Option.empty[String]), (2L, Option.empty[String]),
      (3L, Option("x"))).toDF("id", "text")
    val neu = Seq((1L, Option.empty[String]), (2L, Option("v")),
      (3L, Option.empty[String])).toDF("id", "text")
    val got = ops(Cdc.diff(old, neu, Seq("id"), Seq("text")).collect())
    assert(got == Map(2L -> "update", 3L -> "update"))
  }

  test("diff of two lake snapshots via readAt (append-only: inserts)") {
    val root = Files.createTempDirectory("graft-cdcspec").toString
    val lake = new LakeTable(root)
    Seq((1L, "a"), (2L, "b")).toDF("id", "text")
      .write.parquet(s"$root/data/s1")
    val v1 = lake.commit(lake.listParquet(s"$root/data/s1"), Seq("s1"), Nil, Map.empty)
    Seq((3L, "c")).toDF("id", "text").write.parquet(s"$root/data/s2")
    val v2 = lake.commit(lake.listParquet(s"$root/data/s2"), Seq("s2"), Nil, Map.empty)
    val got = ops(Cdc.diff(lake.readAt(spark, v1), lake.readAt(spark, v2),
      Seq("id"), Seq("text")).collect())
    assert(got == Map(3L -> "insert"))
  }

  test("co-bucketed snapshots: the whole diff plans with zero Exchange") {
    val root = Files.createTempDirectory("graft-cdcbuck").toString
    val old = (0 until 300).map(i => (i.toLong, s"t-$i")).toDF("id", "text")
    val neu = (0 until 300).map(i => (i.toLong, if (i % 7 == 0) s"u-$i" else s"t-$i"))
      .toDF("id", "text")
    spark.sql("DROP TABLE IF EXISTS graft_cdc_old")
    spark.sql("DROP TABLE IF EXISTS graft_cdc_new")
    graft.layout.Bucketed.write(old, "graft_cdc_old", "id", 4, s"$root/old")
    graft.layout.Bucketed.write(neu, "graft_cdc_new", "id", 4, s"$root/new")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val d = Cdc.diff(spark.table("graft_cdc_old"), spark.table("graft_cdc_new"),
        Seq("id"), Seq("text"))
      val plan = d.queryExecution.explainString(ExplainMode.fromString("formatted"))
      val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(plan).length
      assert(exchanges == 0, s"bucketed diff still shuffles:\n$plan")
      assert(d.count() == (0 until 300).count(_ % 7 == 0))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
