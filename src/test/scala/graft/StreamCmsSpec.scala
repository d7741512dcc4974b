package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.sketch.CountMin
import graft.streaming.StreamExtract

/** Streaming Count-Min: cross-batch keyed counter state emitting monotone
  * running totals (driver gate: q_stream_cms). */
class StreamCmsSpec extends SparkSuiteBase {
  import spark.implicits._
  implicit lazy val s: org.apache.spark.sql.SparkSession = spark

  test("cmsTotals: max-merged totals sink == batch build across batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[String]
    val out = StreamExtract.cmsTotals(stream.toDS()).toDF("r", "b", "c")
    val q = out.writeStream.format("memory").queryName("cms_totals")
      .outputMode("append").start()
    try {
      val batch1 = (0 until 50).flatMap(i => Seq.fill(i % 5 + 1)(s"term-$i"))
      val batch2 = (25 until 75).map(i => s"term-$i")
      stream.addData(batch1: _*)
      q.processAllAvailable()
      stream.addData(batch2: _*)
      q.processAllAvailable()
      val streamed = spark.sql("SELECT r, b, max(c) AS c FROM cms_totals GROUP BY 1, 2")
        .orderBy("r", "b").collect().toSeq
      val batch = CountMin.build((batch1 ++ batch2).toDF("v"), "v")
        .orderBy("r", "b").collect().toSeq
      assert(streamed == batch)
    } finally q.stop()
  }

  test("cmsTotals: per-counter emissions are strictly increasing (monotone)") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[String]
    val out = StreamExtract.cmsTotals(stream.toDS()).toDF("r", "b", "c")
    val q = out.writeStream.format("memory").queryName("cms_totals2")
      .outputMode("append").start()
    try {
      stream.addData(Seq.fill(3)("x"): _*)
      q.processAllAvailable()
      stream.addData(Seq.fill(2)("x"): _*)
      q.processAllAvailable()
      val perCounter = spark.sql(
        "SELECT r, b, count(*) AS n, count(DISTINCT c) AS d, max(c) AS mx FROM cms_totals2 GROUP BY 1, 2")
        .collect()
      perCounter.foreach { row =>
        assert(row.getLong(2) == row.getLong(3), "duplicate total emitted")
        assert(row.getLong(4) == 5L)
      }
    } finally q.stop()
  }
}
