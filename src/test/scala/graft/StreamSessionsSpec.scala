package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamExtract

/** Streaming gap sessionization (driver gate: q_stream_sessions). */
class StreamSessionsSpec extends SparkSuiteBase {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)
  private val GapUs = 600L * 1000000 // 600 s

  test("sessions stream: seals on watermark, session_idx ordinal, data-path seal") {
    implicit val sqlCtx = spark.sqlContext
    implicit val sp = spark
    val stream = MemoryStream[(Long, Timestamp, Long)]
    val out = StreamExtract.sessionsStream(stream.toDS(), GapUs)
      .toDF("user_id", "session_idx", "n_events", "start_us", "span_us")
    val q = out.writeStream.format("memory").queryName("ssess")
      .outputMode("append").start()
    def rows() = spark.sql("SELECT * FROM ssess")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    try {
      // b1: one session [1000, 1300] for user 7 (gap 600s)
      stream.addData((7L, ts(1000), 1L), (7L, ts(1300), 2L))
      q.processAllAvailable()
      assert(rows().isEmpty) // watermark still behind
      // b2: user 7 again at t=5000 — advances wm (b3) and opens session 2;
      // the DATA path must seal session 1 once wm passes 1300+600
      stream.addData((7L, ts(5000), 3L))
      q.processAllAvailable()
      // b3: data for user 7 at a far time: wm jumps, data invocation seals
      stream.addData((7L, ts(9000), 4L))
      q.processAllAvailable()
      assert(rows().contains((7L, 1L, 2L, 1000000000L, 300000000L)), rows().toString)
      // b4/b5: another user's data advances wm past 5000+600 and then
      // triggers the TIMEOUT batch for user 7's idle session 2
      stream.addData((8L, ts(20000), 5L))
      q.processAllAvailable()
      stream.addData((8L, ts(20001), 6L))
      q.processAllAvailable()
      val got = rows()
      assert(got.contains((7L, 2L, 1L, 5000000000L, 0L)), got.toString)
    } finally q.stop()
  }

  test("sessions stream: a late in-watermark event BRIDGES two fragments") {
    implicit val sqlCtx = spark.sqlContext
    implicit val sp = spark
    val stream = MemoryStream[(Long, Timestamp, Long)]
    // 1h watermark delay: t=1500 arriving after t=2000 is still in-watermark
    val out = StreamExtract.sessionsStream(stream.toDS(), GapUs, "1 hour")
      .toDF("user_id", "session_idx", "n_events", "start_us", "span_us")
    val q = out.writeStream.format("memory").queryName("ssess_bridge")
      .outputMode("append").start()
    try {
      stream.addData((1L, ts(1000), 1L), (1L, ts(2000), 2L)) // 1000s apart: 2 fragments
      q.processAllAvailable()
      stream.addData((1L, ts(1500), 3L)) // 500 < gap on BOTH sides: merge all
      q.processAllAvailable()
      stream.addData((2L, ts(50000), 4L)) // wm -> 50000-3600 = 46400
      q.processAllAvailable()
      stream.addData((2L, ts(50001), 5L)) // timeout batch
      q.processAllAvailable()
      val got = spark.sql("SELECT * FROM ssess_bridge")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(got.contains((1L, 1L, 3L, 1000000000L, 1000000000L)), got.toString)
    } finally q.stop()
  }

  test("sessions stream: AvailableNow drain equals batch sessions sealed by the final watermark") {
    implicit val sp = spark
    import org.apache.spark.sql.streaming.Trigger
    val root = java.nio.file.Files.createTempDirectory("ssess-an-").toString
    val rnd = new scala.util.Random(5)
    var tcur = 10000L
    val evs = (0 until 400).map { i =>
      tcur += rnd.nextInt(1200)
      (i % 5L, ts(tcur + (i % 5) * 977), i.toLong)
    }
    val df = evs.toDF("user_id", "t", "event_id")
      .select(col("user_id"), col("t").cast("timestamp").as("t"), col("event_id"))
    df.repartition(4).write.parquet(s"$root/in") // several files → several batches
    val src = spark.readStream.schema(df.schema).parquet(s"$root/in")
      .as[(Long, Timestamp, Long)]
    StreamExtract.sessionsStream(src, GapUs, "0 seconds")
      .toDF("user_id", "session_idx", "n_events", "start_us", "span_us")
      .writeStream.format("parquet").option("path", s"$root/out")
      .option("checkpointLocation", s"$root/ckpt")
      .outputMode("append").trigger(Trigger.AvailableNow())
      .start().awaitTermination()
    val got = spark.read.parquet(s"$root/out")
      .as[(Long, Long, Long, Long, Long)].collect().toSet

    // batch replay: sessions whose end + gap <= final watermark (ms floor)
    val wmUs = (evs.map(e => e._2.getTime).max) * 1000L
    val want = graft.events.Sessions.summarize(df, "user_id", "t", "event_id", GapUs)
      .where(col("start_us") + col("span_us") + GapUs <= wmUs)
      .select(col("user"), col("session_idx"), col("n_events"),
        col("start_us"), col("span_us"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(want.nonEmpty, "degenerate test: nothing sealed")
    assert(got == want, s"stream ${got.size} vs batch ${want.size}; " +
      s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
  }
}
