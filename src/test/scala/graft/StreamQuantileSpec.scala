package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.sketch.Quantile
import graft.streaming.StreamExtract

/** Streaming decade-histogram: cross-batch keyed (key, bucket) counter
  * state emitting monotone running totals (driver gate: q_stream_quantile). */
class StreamQuantileSpec extends SparkSuiteBase {
  import spark.implicits._
  implicit lazy val s: org.apache.spark.sql.SparkSession = spark

  test("histogramTotals: max-merged totals sink == batch histogram across batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, Long)]
    val out = StreamExtract.histogramTotals(stream.toDS()).toDF("key", "lo", "cnt")
    val q = out.writeStream.format("memory").queryName("quant_totals")
      .outputMode("append").start()
    try {
      val rnd = new scala.util.Random(5)
      val batch1 = (0 until 400).map(i => (s"k${i % 2}", rnd.nextInt(5000).toLong))
      val batch2 = (0 until 300).map(i => (s"k${i % 3}", rnd.nextInt(500000).toLong))
      stream.addData(batch1: _*)
      q.processAllAvailable()
      stream.addData(batch2: _*)
      q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT key, lo, max(cnt) AS cnt FROM quant_totals GROUP BY 1, 2")
        .orderBy("key", "lo").collect().toSeq
      val batch = Quantile.histogram((batch1 ++ batch2).toDF("key", "v"), "key", "v")
        .orderBy("key", "lo").collect().toSeq
      assert(streamed == batch)
    } finally q.stop()
  }

  test("histogramTotals: untouched buckets stay silent; touched ones emit once per batch") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, Long)]
    val out = StreamExtract.histogramTotals(stream.toDS()).toDF("key", "lo", "cnt")
    val q = out.writeStream.format("memory").queryName("quant_totals2")
      .outputMode("append").start()
    try {
      stream.addData(("a", 7L), ("a", 8L), ("a", 95L))
      q.processAllAvailable()
      stream.addData(("a", 9L)) // touches only the lo=9 bucket
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT key, lo, count(*) AS n, max(cnt) AS mx FROM quant_totals2 GROUP BY 1, 2")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      // batch1: 7 → lo=7, 8 → lo=8, 95 → lo=90; batch2: 9 → lo=9 only.
      assert(rows == Set(("a", 7L, 1L, 1L), ("a", 8L, 1L, 1L),
        ("a", 90L, 1L, 1L), ("a", 9L, 1L, 1L)))
    } finally q.stop()
  }
}
