package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamExtract

/** Streaming exact dedup: keep-first per content hash ACROSS micro-batches
  * via keyed state, with dropped-lineage annotation (streaming form of
  * ExactDedup.annotate / the DedupJob dropped relation). */
class StreamDedupSpec extends SparkSuiteBase {
  import spark.implicits._
  implicit lazy val s: org.apache.spark.sql.SparkSession = spark

  test("dedupStream: cross-batch duplicates annotated with the original keeper") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, String)]
    val out = StreamExtract.dedupStream(stream.toDS()).toDF("url", "is_duplicate", "duplicate_of")
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      // batch 1: b and a share content; keep-first within batch = min url
      stream.addData(("b", "same content"), ("a", "same content"), ("k", "unique one"))
      q.processAllAvailable()
      // batch 2: c duplicates batch-1 content (state must remember keeper
      // "a"); d is new
      stream.addData(("c", "same content"), ("d", "another text"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT url, is_duplicate, duplicate_of FROM dedup_out")
        .collect().map(r => (r.getString(0), r.getBoolean(1), r.getString(2))).toMap2
      assert(rows == Map(
        "a" -> (false, "a"),
        "b" -> (true, "a"),
        "k" -> (false, "k"),
        "c" -> (true, "a"), // cross-batch: keeper survives in state
        "d" -> (false, "d")))
    } finally q.stop()
  }

  test("dedupStream: redelivered keeper url annotates as duplicate, within and across batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, String)]
    val out = StreamExtract.dedupStream(stream.toDS()).toDF("url", "is_duplicate", "duplicate_of")
    val q = out.writeStream.format("memory").queryName("dedup_out3")
      .outputMode("append").start()
    try {
      // batch 1: the keeper url itself arrives twice (source redelivery)
      stream.addData(("a", "payload"), ("a", "payload"))
      q.processAllAvailable()
      // batch 2: the keeper url arrives again
      stream.addData(("a", "payload"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT url, is_duplicate FROM dedup_out3")
        .collect().map(r => (r.getString(0), r.getBoolean(1)))
      // exactly ONE non-duplicate emission ever; the two redeliveries are dups
      assert(rows.length == 3)
      assert(rows.count(!_._2) == 1, rows.mkString(","))
    } finally q.stop()
  }

  test("dedupStream: restarted content in a later batch still dedups within the batch") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, String)]
    val out = StreamExtract.dedupStream(stream.toDS()).toDF("url", "is_duplicate", "duplicate_of")
    val q = out.writeStream.format("memory").queryName("dedup_out2")
      .outputMode("append").start()
    try {
      stream.addData(("z", "alpha"), ("y", "alpha"), ("x", "alpha"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT url, is_duplicate, duplicate_of FROM dedup_out2")
        .collect().map(r => (r.getString(0), r.getBoolean(1), r.getString(2)))
      assert(rows.length == 3)
      assert(rows.count(!_._2) == 1)
      assert(rows.forall(_._3 == "x")) // lexicographically smallest url wins
    } finally q.stop()
  }

  private implicit class MapOps(rows: Array[(String, Boolean, String)]) {
    def toMap2: Map[String, (Boolean, String)] =
      rows.map { case (u, d, k) => u -> (d, k) }.toMap
  }
}
