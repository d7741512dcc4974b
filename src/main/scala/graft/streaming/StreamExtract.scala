package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode, Trigger}
import graft.PageRow
import graft.extract.Extract
import graft.chunk.Chunker

/** Structured Streaming surfaces.
  *
  * The reference is strictly batch-with-resume (SURVEY.md §2.9) — its
  * incremental machinery maps to the lake layer's snapshot anti-join, run as
  * `Trigger.AvailableNow` micro-batch. These entry points cover the
  * streaming shape for continuous ingest of the same pipeline:
  *
  *  - `extractStream`: pages stream → the identical extraction/chunk logic
  *    (same code path as batch — one pipeline, two triggers);
  *  - `eventCounts`: event-time windowed aggregation with a watermark over
  *    the `events` table schema (ts, event_type, value).
  */
object StreamExtract {

  /** Streaming extraction: same typed stages as the batch job. Works on any
    * streaming Dataset[PageRow] source (file source over the pages table
    * directory, or MemoryStream in tests). */
  def extractStream(pages: Dataset[PageRow])(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val docs = pages.mapPartitions(_.map(p => Extract.extractOne(p.url, p.html)))
    docs.flatMap { d =>
      if (d.err.isEmpty && d.text.nonEmpty)
        Chunker.chunkDocument(d.url, graft.Hashing.sha256Hex(d.text), d.text)
      else Nil
    }.toDF()
  }

  /** Event-time tumbling-window counts with a watermark (late data beyond
    * 10 minutes dropped; state bounded — the 100-TB-stream shape). */
  def eventCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("total"))
      .select(col("window.start").as("win_start"), col("event_type"), col("cnt"), col("total"))

  /** Streaming exact dedup with lineage — the streaming form of
    * `ExactDedup.annotate`: keep the first document per content hash
    * ACROSS micro-batches via keyed state, annotating every later arrival
    * with `is_duplicate` and the keeper's url (the same dropped-lineage
    * shape `DedupJob` persists in batch).
    *
    * Keyed state is one url per distinct content — bounded by distinct
    * corpus contents, not stream length; rows shuffle once on the content
    * hash (high-cardinality, uniform by construction). Within a batch the
    * keeper is the lexicographically smallest url (matching batch
    * keep-first determinism); across batches the earlier batch wins. For
    * streams where state must be evicted, compose `withWatermark` +
    * `dropDuplicatesWithinWatermark` instead and give up the lineage
    * column. */
  def dedupStream(docs: Dataset[(String, String)])(
      implicit spark: SparkSession): Dataset[(String, Boolean, String)] = {
    import spark.implicits._
    docs
      .map { case (url, text) => (graft.Hashing.sha256Hex(text), url) }
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String, rows: Iterator[(String, String)], state: GroupState[String]) => {
          // exactly ONE non-duplicate emission per content, ever: the first
          // sorted url of the first batch. Every other row — including a
          // redelivered copy of the keeper url itself — annotates as a
          // duplicate, mirroring batch ExactDedup.annotate's row_number>1.
          val urls = rows.map(_._2).toVector.sorted
          val existing = state.getOption
          val keeper = existing.getOrElse { state.update(urls.head); urls.head }
          val out =
            if (existing.isEmpty) (urls.head, false, keeper) +: urls.tail.map(u => (u, true, keeper))
            else urls.map(u => (u, true, keeper))
          out.iterator
        })
  }

  /** Streaming MinHash NEAR-dup detection — the streaming member of the
    * near-dup family beside [[dedupStream]]'s exact hash: cross-batch keyed
    * state per LSH bucket, so a near-duplicate of a document seen in ANY
    * earlier micro-batch is flagged the moment it arrives.
    *
    * Mechanics: each doc emits its 32 (band, bhash) keys in a narrow
    * flatMap carrying the 128-slot signature (1 KB — the state payload);
    * `flatMapGroupsWithState` keyed on the bucket holds the first
    * `maxBucket` arrivals (url, signature) as members. An arrival emits one
    * verdict row (url, duplicate_of = member url) for EVERY member whose
    * signature-estimated Jaccard clears `threshold`, then joins the bucket
    * itself while capacity lasts (matched or not). The output is therefore
    * exactly the relation { (u, v) : v arrived before u, v within the
    * bucket cap, u and v share a band bucket, estJaccard >= threshold } —
    * a closed form under ANY similarity graph (chains included), which is
    * what makes the operator end-to-end oracle-checkable; root-picking on
    * the verdict graph is downstream clustering's job, exactly as batch
    * `DedupJob` clusters verified pairs with `Components`.
    *
    * Streaming tradeoffs vs batch `MinHash.nearDupPairs`, stated rather
    * than hidden: verification is SIGNATURE-estimated Jaccard (±~0.04 at
    * 128 hashes) because exact verification would need full texts in state;
    * precedence is arrival-order across batches (earlier batch wins,
    * url-sorted within a batch — deterministic for a deterministic stream);
    * a pair may be re-emitted once per shared band and per redelivery
    * (consumers dedup by (url, duplicate_of) — at-least-once verdicts).
    * State is bounded by distinct buckets × maxBucket × 1 KB — corpus
    * content, not stream length; for unbounded-vocabulary streams use
    * [[nearDupVerdictsEvicting]], which bounds state by watermark-driven
    * eviction at the price of recall decay on evicted buckets. */
  def nearDupVerdicts(docs: Dataset[(String, String)], threshold: Double = 0.8,
                      maxBucket: Int = 64)(
      implicit spark: SparkSession): Dataset[(String, String)] = {
    import spark.implicits._
    import graft.dedup.MinHash
    val banded = docs.flatMap { case (url, text) =>
      val sig = MinHash.signature(text)
      MinHash.bandHashes(sig).zipWithIndex.map { case (h, b) => (b, h, url, sig) }
    }
    banded
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: (Int, Long), rows: Iterator[(Int, Long, String, Array[Long])],
         state: GroupState[Seq[(String, Array[Long])]]) => {
          var members = state.getOption.getOrElse(Seq.empty)
          val out = Seq.newBuilder[(String, String)]
          rows.toVector.sortBy(_._3).foreach { case (_, _, url, sig) =>
            members.foreach { case (mu, ms) =>
              if (mu != url && MinHash.estJaccard(ms, sig) >= threshold)
                out += ((url, mu))
            }
            if (members.size < maxBucket && !members.exists(_._1 == url))
              members = members :+ ((url, sig))
          }
          state.update(members)
          out.result().iterator
        })
  }

  /** [[nearDupVerdicts]] with **watermark-driven state eviction** — the
    * unbounded-vocabulary-stream form: rows carry an event timestamp, and
    * an LSH bucket whose newest arrival has fallen `evictAfterMs` behind
    * the event-time watermark is REMOVED from state
    * (`GroupStateTimeout.EventTimeTimeout`). State is then bounded by the
    * bucket-arrival rate × the eviction horizon — independent of total
    * stream vocabulary, the property `NoTimeout` cannot give.
    *
    * The documented tradeoff is RECALL DECAY: a near-duplicate of a
    * document whose buckets were evicted is NOT flagged (it re-seeds the
    * buckets as a fresh member instead). Precision is unaffected — every
    * emitted verdict still names a genuinely co-bucketed, estimator-passing
    * member. StreamDedupSpec pins both halves: the bounded-state row count
    * after eviction and the missed verdict on an evicted bucket. */
  def nearDupVerdictsEvicting(docs: Dataset[(String, String, java.sql.Timestamp)],
                              threshold: Double = 0.8, maxBucket: Int = 64,
                              watermarkDelay: String = "0 seconds",
                              evictAfterMs: Long = 10 * 60 * 1000L)(
      implicit spark: SparkSession): Dataset[(String, String)] = {
    import spark.implicits._
    import graft.dedup.MinHash
    val banded = docs.flatMap { case (url, text, ts) =>
      val sig = MinHash.signature(text)
      MinHash.bandHashes(sig).zipWithIndex.map { case (h, b) => (b, h, url, sig, ts) }
    }.withWatermark("_5", watermarkDelay)
    banded
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (_: (Int, Long),
         rows: Iterator[(Int, Long, String, Array[Long], java.sql.Timestamp)],
         state: GroupState[Seq[(String, Array[Long])]]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var members = state.getOption.getOrElse(Seq.empty)
            val out = Seq.newBuilder[(String, String)]
            var maxTs = Long.MinValue
            rows.toVector.sortBy(_._3).foreach { case (_, _, url, sig, ts) =>
              maxTs = math.max(maxTs, ts.getTime)
              members.foreach { case (mu, ms) =>
                if (mu != url && MinHash.estJaccard(ms, sig) >= threshold)
                  out += ((url, mu))
              }
              if (members.size < maxBucket && !members.exists(_._1 == url))
                members = members :+ ((url, sig))
            }
            state.update(members)
            // evict when the watermark passes the bucket's newest arrival by
            // the horizon (clamped above the current watermark — Spark
            // rejects timeouts at or below it)
            state.setTimeoutTimestamp(
              math.max(maxTs, state.getCurrentWatermarkMs() + 1) + evictAfterMs)
            out.result().iterator
          }
        })
  }

  /** Streaming gap-based sessionization — [[graft.events.Sessions]]
    * in-stream with WATERMARK FINALIZATION: per-user keyed state holds the
    * user's OPEN session fragments (start_us, end_us, n_events); arrivals
    * — out-of-order up to the watermark — merge fragments whenever the
    * inter-event distance is strictly under the gap (two fragments can
    * be BRIDGED by one late event); a session emits exactly once, when
    * the event-time watermark passes `end + gap` (no in-watermark event
    * can extend or bridge into it any more: an event at t ≥ wm ≥ end+gap
    * is ≥ gap away — a new session by definition; anything older is late
    * and dropped). Emission therefore carries the same closed-form
    * guarantee as the batch operator restricted to the sealed prefix,
    * and q_stream_sessions' oracle is the batch lag/cumsum replay with
    * `HAVING end + gap <= final watermark` — the finalization-as-HAVING
    * discipline of q_stream_events.
    *
    * `session_idx` rides a per-user emitted-session counter in state:
    * sessions of a user are disjoint and seal in start order, so the
    * counter reproduces the batch cumsum ordinal.
    *
    * State is bounded by fragments within one gap horizon of the
    * watermark per user — eviction IS the emission (EventTimeTimeout),
    * no separate GC. At-least-once caveat as siblings: a redelivered
    * event double-counts n_events (counts, not membership).
    *
    * Input tuples (user, ts, event_id); output
    * (user, session_idx, n_events, start_us, span_us). */
  def sessionsStream(events: Dataset[(Long, java.sql.Timestamp, Long)],
                     gapUs: Long, watermarkDelay: String = "0 seconds")(
      implicit spark: SparkSession): Dataset[(Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    require(gapUs > 0, "gapUs must be positive")
    def micros(t: java.sql.Timestamp): Long =
      (t.getTime / 1000L) * 1000000L + t.getNanos / 1000L
    def mergeFrags(fs: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long)] =
      fs.sortBy(f => (f._1, f._2)).foldLeft(Vector.empty[(Long, Long, Long)]) { (acc, f) =>
        acc.lastOption match {
          case Some((s, e, n)) if f._1 - e < gapUs =>
            acc.init :+ ((s, math.max(e, f._2), n + f._3))
          case _ => acc :+ f
        }
      }
    // seal fragments the watermark has passed; returns (emittedRows, newState)
    def seal(user: Long, st: (Long, Seq[(Long, Long, Long)]), wmUs: Long)
        : (Seq[(Long, Long, Long, Long, Long)], (Long, Seq[(Long, Long, Long)])) = {
      val (closed, open) = st._2.partition(f => f._2 + gapUs <= wmUs)
      val rows = closed.sortBy(_._1).zipWithIndex.map { case ((s, e, n), i) =>
        (user, st._1 + i + 1, n, s, e - s)
      }
      (rows, (st._1 + closed.size, open))
    }
    events.toDF("u", "ts", "eid") // name-agnostic: any source column names
      .withWatermark("ts", watermarkDelay)
      .as[(Long, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, Long)],
         state: GroupState[(Long, Seq[(Long, Long, Long)])]) => {
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val st0 = state.getOption.getOrElse((0L, Seq.empty[(Long, Long, Long)]))
          val merged: (Long, Seq[(Long, Long, Long)]) =
            if (state.hasTimedOut) st0
            else (st0._1, mergeFrags(st0._2 ++
              rows.map(r => (micros(r._2), micros(r._2), 1L))))
          val (out, st1) = seal(user, merged, wmUs)
          if (st1._2.isEmpty && st1._1 == 0L) state.remove()
          else {
            state.update(st1)
            if (st1._2.nonEmpty) {
              // fire when the watermark can seal the earliest open fragment
              val sealMs = (st1._2.map(_._2).min + gapUs + 999L) / 1000L
              state.setTimeoutTimestamp(
                math.max(sealMs, state.getCurrentWatermarkMs() + 1L))
            }
          }
          out.iterator
        })
  }

  /** Streaming HyperLogLog: per-(key, register) keyed state holds the
    * running max rank — ONE Int per group, so TOTAL state is bounded at
    * [[graft.sketch.Hll.M]]·|keys| regardless of stream length (the
    * sketch-in-stream property; no watermark eviction needed because the
    * sketch, not the stream, bounds the state). Emits a delta row only
    * when a batch RAISES a register.
    *
    * The delta sink is max-idempotent: `groupBy(key, j).max(m)` over the
    * emitted rows equals the batch [[graft.sketch.Hll.registers]] of
    * everything ingested, regardless of batch order, redelivery, or
    * duplication — at-least-once delivery needs no dedup pass. */
  def hllDeltas(rows: Dataset[(String, String)])(
      implicit spark: SparkSession): Dataset[(String, Int, Int)] = {
    import spark.implicits._
    graft.sketch.Hll.observations(rows.toDF("key", "v"), "key", "v")
      .as[(String, Int, Int)]
      // partial max per (key, register) WITHIN each input partition before
      // the state shuffle (map-side aggregation, guide §2.3): the keyed
      // state folds a max, so shipping one pre-maxed row per (partition,
      // key, j) instead of one per observation leaves every batch's
      // register maxima — and therefore the emitted deltas — identical
      // while the stateful exchange carries ≤ M·|keys| rows per partition
      .mapPartitions { it =>
        val acc = scala.collection.mutable.HashMap.empty[(String, Int), Int]
        it.foreach { case (k, j, m) =>
          val key = (k, j)
          val prev = acc.getOrElse(key, 0)
          if (m > prev) acc(key) = m
        }
        acc.iterator.map { case ((k, j), m) => (k, j, m) }
      }
      .groupByKey(t => (t._1, t._2))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (kj: (String, Int), rs: Iterator[(String, Int, Int)], state: GroupState[Int]) => {
          var batchMax = 0
          rs.foreach(t => if (t._3 > batchMax) batchMax = t._3)
          val prev = state.getOption.getOrElse(0)
          if (batchMax > prev) {
            state.update(batchMax)
            Iterator.single((kj._1, kj._2, batchMax))
          } else Iterator.empty
        })
  }

  /** Streaming Count-Min: per-(row, bucket) keyed state holds the running
    * counter total — ONE Long per group, TOTAL state bounded at d·w =
    * 4096 regardless of stream length or vocabulary (even harder-bounded
    * than [[hllDeltas]]: the grid is fixed, keys don't scale it). Each
    * batch emits the UPDATED running total for every touched counter;
    * totals are monotone non-decreasing, so the sink is max-idempotent
    * like the HLL delta sink: `groupBy(r, b).max(c)` over the emitted
    * rows equals the batch [[graft.sketch.CountMin.build]] of everything
    * ingested, and sink-side duplication is harmless. */
  def cmsTotals(values: Dataset[String])(
      implicit spark: SparkSession): Dataset[(Int, Int, Long)] = {
    import spark.implicits._
    graft.sketch.CountMin.observations(values.toDF("v"), "v")
      .as[(Int, Int, Long)]
      // partial sum per counter within each input partition (map-side
      // aggregation before the state shuffle — the state fold sums, so
      // per-batch totals are identical; ≤ d·w = 4096 rows cross per
      // partition instead of d rows per input value)
      .mapPartitions { it =>
        val acc = scala.collection.mutable.HashMap.empty[(Int, Int), Long]
        it.foreach { case (r, b, c) =>
          val key = (r, b)
          acc(key) = acc.getOrElse(key, 0L) + c
        }
        acc.iterator.map { case ((r, b), c) => (r, b, c) }
      }
      .groupByKey(t => (t._1, t._2))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (rb: (Int, Int), rs: Iterator[(Int, Int, Long)], state: GroupState[Long]) => {
          var add = 0L
          rs.foreach(add += _._3)
          if (add > 0L) {
            val total = state.getOption.getOrElse(0L) + add
            state.update(total)
            Iterator.single((rb._1, rb._2, total))
          } else Iterator.empty
        })
  }

  /** Streaming decade-histogram ([[graft.sketch.Quantile]] in-stream):
    * per-(key, bucket) keyed state holds the running count — ONE Long per
    * group, TOTAL state bounded at |keys| × ≤172 buckets regardless of
    * stream length (the sketch, not the stream, bounds the state — same
    * property as [[hllDeltas]]/[[cmsTotals]]). Each batch emits the
    * UPDATED running total for every touched bucket; totals are monotone
    * non-decreasing, so the sink is max-idempotent:
    * `groupBy(key, lo).max(cnt)` over the emitted rows equals the batch
    * [[graft.sketch.Quantile.histogram]] of everything ingested, and
    * at-least-once redelivery is harmless. Percentile reads run
    * [[graft.sketch.Quantile.percentiles]] over that folded sink. */
  def histogramTotals(rows: Dataset[(String, Long)])(
      implicit spark: SparkSession): Dataset[(String, Long, Long)] = {
    import spark.implicits._
    graft.sketch.Quantile.observations(rows.toDF("key", "v"), "key", "v")
      .as[(String, Long, Long)]
      // partial sum per (key, bucket) within each input partition — same
      // map-side-aggregation-before-the-state-shuffle shape as
      // [[cmsTotals]]; the summed fold makes per-batch totals identical
      .mapPartitions { it =>
        val acc = scala.collection.mutable.HashMap.empty[(String, Long), Long]
        it.foreach { case (k, lo, c) =>
          val key = (k, lo)
          acc(key) = acc.getOrElse(key, 0L) + c
        }
        acc.iterator.map { case ((k, lo), c) => (k, lo, c) }
      }
      .groupByKey(t => (t._1, t._2))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (kl: (String, Long), rs: Iterator[(String, Long, Long)], state: GroupState[Long]) => {
          var add = 0L
          rs.foreach(add += _._3)
          if (add > 0L) {
            val total = state.getOption.getOrElse(0L) + add
            state.update(total)
            Iterator.single((kl._1, kl._2, total))
          } else Iterator.empty
        })
  }

  /** Stream-stream watermarked band join: each purchase matched to the same
    * user's views at most `bandSec` seconds BEFORE it (forward band — the
    * streaming form of the batch attribution join, [[graft.events.RangeJoin]]
    * being the symmetric-radius batch cousin). Both inputs are streams of
    * `(user_id, ts, event_id)`.
    *
    * Plan shape: StreamingSymmetricHashJoin — both sides shuffle ONCE on
    * `user_id` and buffer rows in keyed state. The time-band condition plus
    * the two watermarks bound that state on BOTH sides: a view is evicted
    * once the watermark passes `v_ts + bandSec` (no in-time purchase can
    * still match it), a purchase once the watermark passes `p_ts`. So state
    * per side is the last `bandSec + delay` of events — independent of
    * stream length, the property that lets this run forever on a
    * 1000-executor cluster. Inner join: every surviving match is emitted in
    * the micro-batch where the later side arrives; rows later than the
    * global (min-of-sides) watermark are dropped as late — the recall trade
    * is explicit in `delay`. */
  def bandJoinStream(views: DataFrame, purchases: DataFrame,
      bandSec: Long, delay: String = "10 minutes"): DataFrame = {
    val v = views.select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
      .withWatermark("v_ts", delay)
    val p = purchases.select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", delay)
    v.join(p,
        col("p_user") === col("v_user") &&
          col("p_ts") >= col("v_ts") &&
          col("p_ts") <= col("v_ts") + expr(s"INTERVAL $bandSec SECONDS"))
      .select(col("v_user").as("user_id"), col("view_id"), col("purchase_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("v_ts"))).as("delta_us"))
  }

  /** Batch-over-table incremental run: `Trigger.AvailableNow` drains the
    * pages directory once and stops — the streaming-native equivalent of the
    * reference's resume loop (checkpointed source offsets replace the
    * progress ledger). */
  def availableNowWriter(chunks: DataFrame, outDir: String, checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    chunks.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
}
