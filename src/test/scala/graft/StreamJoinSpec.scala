package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamExtract

/** Stream-stream watermarked band join: purchases matched to the same
  * user's views within a forward band. Pins the two properties the gate's
  * single-batch drain cannot see: cross-batch state carry (a view buffered
  * in batch 1 matches a purchase arriving in batch 2) and watermark-driven
  * eviction / late-drop (once the global watermark passes, old views are
  * gone and late purchases are dropped). */
class StreamJoinSpec extends SparkSuiteBase {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("bandJoinStream: cross-batch match, then watermark evicts and drops late") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val purchases = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val out = StreamExtract.bandJoinStream(
      views.toDF().toDF("user_id", "ts", "event_id"),
      purchases.toDF().toDF("user_id", "ts", "event_id"),
      bandSec = 3600L, delay = "10 minutes")
    val q = out.writeStream.format("memory").queryName("sjoin_out")
      .outputMode("append").start()
    try {
      // t well above epoch 0 (rows tying the initial watermark are late)
      val t0 = 100000L
      // b1: two views, no purchases yet — nothing emitted, state buffers both
      views.addData((1L, ts(t0), 100L), (2L, ts(t0), 200L))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM sjoin_out").count() == 0)
      // b2: u1 purchase 30 min later — joins the batch-1 view (state carry).
      // Watermark pushers on BOTH sides (global watermark is the min): an
      // unmatched far-future view and purchase drive wm to t0+10h-10min.
      purchases.addData((1L, ts(t0 + 1800), 300L), (99L, ts(t0 + 36000), 999L))
      views.addData((98L, ts(t0 + 36000), 998L))
      q.processAllAvailable()
      val afterB2 = spark.sql("SELECT user_id, view_id, purchase_id, delta_us FROM sjoin_out")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(afterB2 == Set((1L, 100L, 300L, 1800000000L)), s"got $afterB2")
      // b3: u2 purchase in-band relative to its view, but the watermark
      // (t0+10h-10min) has long passed t0+band — u2's view is evicted and
      // the purchase itself is late → no new pair.
      purchases.addData((2L, ts(t0 + 2400), 400L))
      q.processAllAvailable()
      val afterB3 = spark.sql("SELECT count(*) FROM sjoin_out").as[Long].head()
      assert(afterB3 == 1L, s"late pair leaked: $afterB3 rows")
      // bounded-state half: only the two far-future pushers may remain
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= 2, s"state not evicted: $stateRows rows")
    } finally q.stop()
  }

  test("bandJoinStream: band edges — at-band matches, beyond-band and backward do not") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val purchases = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val out = StreamExtract.bandJoinStream(
      views.toDF().toDF("user_id", "ts", "event_id"),
      purchases.toDF().toDF("user_id", "ts", "event_id"),
      bandSec = 3600L)
    val q = out.writeStream.format("memory").queryName("sjoin_edges")
      .outputMode("append").start()
    try {
      val t0 = 100000L
      views.addData((1L, ts(t0), 10L), (2L, ts(t0), 20L), (3L, ts(t0), 30L))
      purchases.addData(
        (1L, ts(t0 + 3600), 11L), // exactly at band → pair
        (2L, ts(t0 + 3601), 21L), // one second beyond → no pair
        (3L, ts(t0 - 1), 31L)) // purchase BEFORE the view → no pair
      q.processAllAvailable()
      val rows = spark.sql("SELECT user_id, view_id, purchase_id, delta_us FROM sjoin_edges")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(rows == Set((1L, 10L, 11L, 3600000000L)), s"got $rows")
    } finally q.stop()
  }
}
