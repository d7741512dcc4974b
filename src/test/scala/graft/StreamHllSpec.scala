package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.sketch.Hll
import graft.streaming.StreamExtract

/** Streaming HyperLogLog: cross-batch keyed register state emitting
  * register-raise deltas (driver gate: q_stream_hll). */
class StreamHllSpec extends SparkSuiteBase {
  import spark.implicits._
  implicit lazy val s: org.apache.spark.sql.SparkSession = spark

  private def vals(key: String, lo: Int, hi: Int) =
    (lo until hi).map(i => (key, s"$key-value-$i"))

  test("hllDeltas: max-merged delta sink == batch registers across batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, String)]
    val out = StreamExtract.hllDeltas(stream.toDS()).toDF("key", "j", "m")
    val q = out.writeStream.format("memory").queryName("hll_deltas")
      .outputMode("append").start()
    try {
      stream.addData(vals("a", 0, 400): _*)
      q.processAllAvailable()
      // batch 2 overlaps batch 1 (redelivery) and extends it; new key b
      stream.addData(vals("a", 300, 800) ++ vals("b", 0, 100): _*)
      q.processAllAvailable()
      // batch 3: pure redelivery — must add NO new registers
      val before = spark.sql("SELECT count(*) FROM hll_deltas").head().getLong(0)
      stream.addData(vals("a", 0, 400): _*)
      q.processAllAvailable()
      val after = spark.sql("SELECT count(*) FROM hll_deltas").head().getLong(0)
      assert(after == before, "redelivered batch raised a register")

      val streamed = spark.sql("SELECT key, j, max(m) AS m FROM hll_deltas GROUP BY 1, 2")
        .orderBy("key", "j").collect().toSeq
      val batch = Hll.registers(
        (vals("a", 0, 800) ++ vals("b", 0, 100)).toDF("key", "v"), "key", "v")
        .orderBy("key", "j").collect().toSeq
      assert(streamed == batch)
    } finally q.stop()
  }

  test("hllDeltas: summary of streamed registers == batch estimate") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, String)]
    val out = StreamExtract.hllDeltas(stream.toDS()).toDF("key", "j", "m")
    val q = out.writeStream.format("memory").queryName("hll_deltas2")
      .outputMode("append").start()
    try {
      stream.addData(vals("k", 0, 1000): _*)
      q.processAllAvailable()
      stream.addData(vals("k", 1000, 2000): _*)
      q.processAllAvailable()
      val regs = spark.sql("SELECT key, j, max(m) AS m FROM hll_deltas2 GROUP BY 1, 2")
      val streamed = Hll.summarize(regs)
        .select("key", "present", "s_scaled", "est_milli").collect().toSeq
      val batch = Hll.estimate(vals("k", 0, 2000).toDF("key", "v"), "key", "v")
        .select("key", "present", "s_scaled", "est_milli").collect().toSeq
      assert(streamed == batch)
    } finally q.stop()
  }
}
