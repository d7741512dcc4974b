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

  test("nearDupVerdicts: cross-batch NEAR-dups flagged via keyed LSH-bucket state") {
    implicit val sqlCtx = spark.sqlContext
    val base = "a sufficiently long paragraph body with plenty of words spread " +
      "around to make the minhash signature stable and carry enough shingles " +
      "for a reliable estimate of similarity between planted mutants"
    val other = "completely different content about streams windows joins and " +
      "aggregations that shares no shingles at all with the planted base " +
      "paragraph used by the near duplicate family of documents here"
    val stream = MemoryStream[(String, String)]
    val out = StreamExtract.nearDupVerdicts(stream.toDS(), threshold = 0.8)
      .toDF("url", "duplicate_of")
    val q = out.writeStream.format("memory").queryName("neardup_out")
      .outputMode("append").start()
    try {
      // batch 1: A base, B = near-dup of A (trailing tokens → est j ~0.92),
      // C unrelated
      stream.addData(("a", base), ("b", base + " tail marker"), ("c", other))
      q.processAllAvailable()
      // batch 2: D near-dups A (STATE from batch 1 must flag it), E new,
      // B redelivered (matches A again — B never became a member)
      stream.addData(("d", base + " other ending"),
        ("e", "an entirely new third document mentioning catalysts executors " +
          "shuffles partitions broadcasts and nothing from either earlier text " +
          "family so it shares no five word shingles with anything seen before"),
        ("b", base + " tail marker"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT url, duplicate_of FROM neardup_out")
        .collect().map(r => (r.getString(0), r.getString(1)))
      val byUrl = rows.groupBy(_._1).view.mapValues(_.map(_._2).distinct.toSet).toMap
      // b flagged against the earlier a (both batches — redelivery re-emits);
      // d flagged against EVERY earlier near-matching member (a certainly;
      // b too if est(b, d) clears the bar — compute the expectation from the
      // operator's own published estimator rather than guessing)
      import graft.dedup.MinHash
      val sigs = Map(
        "a" -> MinHash.signature(base),
        "b" -> MinHash.signature(base + " tail marker"),
        "d" -> MinHash.signature(base + " other ending"))
      val dExpected = Seq("a", "b")
        .filter(m => MinHash.estJaccard(sigs(m), sigs("d")) >= 0.8).toSet
      assert(MinHash.estJaccard(sigs("a"), sigs("b")) >= 0.8) // planted pair is detectable
      assert(byUrl.keySet == Set("b", "d"), s"got $byUrl")
      assert(byUrl("b") == Set("a"), s"got $byUrl")
      assert(byUrl("d") == dExpected, s"got $byUrl expected $dExpected")
    } finally q.stop()
  }

  test("nearDupVerdicts: bucket membership is capped — verdicts only name the first cap arrivals") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, String)]
    // identical text → one bucket per band, est jaccard 1.0. Membership is
    // the first 4 sorted arrivals; every later doc compares against exactly
    // those 4 (over-cap arrivals compare but never join), so the verdict
    // relation is u_i -> {u_j : j < min(i, 4)}: 1+2+3 + 26*4 = 110 pairs.
    val out = StreamExtract.nearDupVerdicts(stream.toDS(), threshold = 0.8, maxBucket = 4)
      .toDF("url", "duplicate_of")
    val q = out.writeStream.format("memory").queryName("neardup_cap")
      .outputMode("append").start()
    try {
      stream.addData((0 until 30).map(i => (f"u$i%02d", "identical body for cap test")): _*)
      q.processAllAvailable()
      val rows = spark.sql("SELECT DISTINCT url, duplicate_of FROM neardup_cap")
        .collect().map(r => (r.getString(0), r.getString(1)))
      assert(rows.length == 110, s"got ${rows.length}")
      assert(rows.forall(_._2 < "u04"), "a verdict named an over-cap member")
    } finally q.stop()
  }

  test("nearDupVerdictsEvicting: idle buckets evicted — bounded state, recall decay pinned") {
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val base = "a sufficiently long paragraph body with plenty of words spread " +
      "around to make the minhash signature stable and carry enough shingles " +
      "for a reliable estimate of similarity between planted mutants"
    val noise1 = "completely different content about streams windows joins and " +
      "aggregations that shares no shingles at all with the planted base paragraph"
    val noise2 = "an entirely new third document mentioning catalysts executors " +
      "shuffles partitions broadcasts and nothing from either earlier text family"
    val stream = MemoryStream[(String, String, java.sql.Timestamp)]
    val out = StreamExtract.nearDupVerdictsEvicting(stream.toDS(),
      threshold = 0.8, evictAfterMs = 60 * 1000L).toDF("url", "duplicate_of")
    val q = out.writeStream.format("memory").queryName("neardup_evict")
      .outputMode("append").start()
    try {
      // timestamps sit well above epoch 0: the query starts with watermark
      // 0, and a row whose event time ties the watermark is dropped as late
      // — t=0 data would never seed state
      // b1: seed a@t=1000
      stream.addData(("a", base, ts(1000)))
      q.processAllAvailable()
      // b2: b@t=1030 — INSIDE the 60 s horizon (watermark 1000) → flagged
      stream.addData(("b", base + " tail marker", ts(1030)))
      q.processAllAvailable()
      // b3 advances the watermark past a/b's timeout (1030 s + 60 s);
      // b4 is the batch where those groups actually time out (timeouts fire
      // against the PREVIOUS batch's watermark)
      stream.addData(("x1", noise1, ts(1600)))
      q.processAllAvailable()
      stream.addData(("x2", noise2, ts(1610)))
      q.processAllAvailable()
      // b5: c is a near-dup of a, but a's buckets were evicted → NO verdict
      // (the recall-decay half of the contract); c re-seeds as fresh member
      stream.addData(("c", base + " other ending", ts(1620)))
      q.processAllAvailable()

      val rows = spark.sql("SELECT url, duplicate_of FROM neardup_evict")
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq
      assert(rows.nonEmpty && rows.forall(_ == ("b", "a")), s"got $rows")

      // the bounded-state half: only x1/x2/c's buckets remain (≤ 3 × 32
      // band keys); had a/b's groups survived, the count would exceed 128
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= 96, s"state not evicted: $stateRows rows")
    } finally q.stop()
  }

  private implicit class MapOps(rows: Array[(String, Boolean, String)]) {
    def toMap2: Map[String, (Boolean, String)] =
      rows.map { case (u, d, k) => u -> (d, k) }.toMap
  }
}
