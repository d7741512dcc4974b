package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked delta+varint posting-list compression — the published inverted-
  * index storage shape (Witten–Moffat–Bell "Managing Gigabytes" §3; the
  * Lucene 128-doc block layout): per term, doc ids sort ascending, split
  * into fixed blocks, delta-encode within the block (first id absolute, so
  * every block decodes standalone), LEB128 varint bytes (7 payload bits
  * per byte, high bit = continuation on all but the last byte).
  *
  * At 100 TB the posting lists ARE the index storage bill: gap+varint
  * turns 8-byte ids into ~1-byte gaps on dense lists. Block-local
  * decoding keeps skip/seek possible, and each block carries `max_tf` —
  * the block-max metadata that upgrades [[Bm25.maxScoreSearch]]-style
  * pruning to block granularity (block-max WAND, Ding & Suel SIGIR'11).
  *
  * Everything is integer arithmetic, so the driver oracle replays byte
  * lengths AND byte sums in closed form (Σ of 7-bit fields + 128 per
  * continuation) — the encoder's emitted bytes are gated against pure
  * SQL arithmetic, never against themselves.
  */
object PostingsCodec {

  /** LEB128 bytes of one non-negative value appended to `out`. */
  def putVarint(v: Long, out: java.io.ByteArrayOutputStream): Unit = {
    require(v >= 0, s"varint of negative $v")
    var x = v
    while ((x & ~0x7fL) != 0L) {
      out.write(((x & 0x7fL) | 0x80L).toInt)
      x >>>= 7
    }
    out.write(x.toInt)
  }

  /** Delta+varint encode an ascending id block (first id absolute). */
  def encodeBlock(ids: Array[Long]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(ids.length + 8)
    var prev = 0L
    var i = 0
    while (i < ids.length) {
      val d = if (i == 0) ids(0) else ids(i) - prev
      require(i == 0 || d > 0, s"ids must be strictly ascending at $i")
      putVarint(d, out)
      prev = ids(i)
      i += 1
    }
    out.toByteArray
  }

  /** Plain (non-delta) varint encoding of an arbitrary non-negative value
    * sequence — the per-posting payload channel (term frequencies travel
    * beside the delta-coded id channel, index-aligned; tfs are small and
    * unsorted, so gaps would not help them). */
  def encodeValues(vals: Array[Long]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(vals.length + 8)
    var i = 0
    while (i < vals.length) { putVarint(vals(i), out); i += 1 }
    out.toByteArray
  }

  /** Decode a plain varint value sequence. */
  def decodeValues(bytes: Array[Byte]): Array[Long] = {
    val out = Array.newBuilder[Long]
    var i = 0
    while (i < bytes.length) {
      var v = 0L
      var shift = 0
      var more = true
      while (more) {
        val b = bytes(i) & 0xff
        v |= (b & 0x7fL) << shift
        shift += 7
        more = (b & 0x80) != 0
        i += 1
      }
      out += v
    }
    out.result()
  }

  /** Decode a block back to absolute ascending ids. */
  def decodeBlock(bytes: Array[Byte]): Array[Long] = {
    val out = Array.newBuilder[Long]
    var i = 0
    var prev = 0L
    var first = true
    while (i < bytes.length) {
      var v = 0L
      var shift = 0
      var more = true
      while (more) {
        val b = bytes(i) & 0xff
        v |= (b & 0x7fL) << shift
        shift += 7
        more = (b & 0x80) != 0
        i += 1
      }
      prev = if (first) v else prev + v
      first = false
      out += prev
    }
    out.result()
  }


  /** Compressed two-channel blocks of a flat (term, doc, tf) posting
    * relation: one row per (term, block) — (term, block, n_docs, max_tf,
    * ids, tfs). The id channel is delta+varint ([[encodeBlock]]), the
    * index-aligned tf channel plain varint ([[encodeValues]]); `max_tf`
    * is the block-max metadata BMW-style pruning reads INSTEAD of the
    * bytes. Doc ids must cast to non-negative longs (gap compression is
    * why — a non-castable id fails the job loudly on the non-nullable
    * encoder). Same single-term-shuffle plan shape as [[blockedPostings]],
    * every aggregate bounded by `blockSize` members. */
  def blocksOf(flat: DataFrame, blockSize: Int = 128): DataFrame = {
    require(blockSize >= 1, s"blockSize $blockSize")
    val spark = flat.sparkSession
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("term").orderBy("doc")
    flat.select(col("term"), col("doc").cast("long").as("doc"),
        col("tf").cast("long").as("tf"))
      .withColumn("rn", row_number().over(w) - 1)
      .withColumn("block", expr(s"cast(rn div $blockSize as bigint)"))
      .groupBy("term", "block")
      .agg(sort_array(collect_list(struct(col("doc"), col("tf")))).as("members"))
      .select(col("term"), col("block"),
        col("members.doc").as("ids"), col("members.tf").as("tfs"))
      .as[(String, Long, Array[Long], Array[Long])]
      .mapPartitions(_.map { case (term, block, ids, tfs) =>
        Block2(term, block, ids.length.toLong, tfs.max,
          encodeBlock(ids), encodeValues(tfs))
      })
      .toDF()
  }

  /** Compressed blocked postings of a corpus: one row per (term, block) —
    * (term, block, n_docs, max_tf, n_bytes, byte_sum, bytes). Ids must
    * cast to non-negative longs.
    *
    * Plan: ONE shuffle on term (the row_number window), per-(term, block)
    * aggregation bounded by `blockSize` members — a stop-word's corpus-
    * sized posting list becomes many independent bounded rows, never one
    * driver-sized array. `byte_sum` (Σ unsigned encoded byte values) is
    * derived from the REAL emitted bytes so the oracle's closed-form
    * arithmetic gates the encoder itself. */
  def blockedPostings(docs: DataFrame, idCol: String, textCol: String,
                      blockSize: Int = 128): DataFrame = {
    require(blockSize >= 1, s"blockSize $blockSize")
    val spark = docs.sparkSession
    import spark.implicits._
    val tf = Bm25.termFreq(docs.filter(col(idCol).isNotNull), idCol, textCol)
      .select(col("term"), col("doc").cast("long").as("doc"), col("tf").cast("long").as("tf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("term").orderBy("doc")
    tf.withColumn("rn", row_number().over(w) - 1)
      .withColumn("block", expr(s"cast(rn div $blockSize as bigint)"))
      .groupBy("term", "block")
      .agg(sort_array(collect_list(struct(col("doc"), col("tf")))).as("members"))
      .select(col("term"), col("block"),
        col("members.doc").as("ids"), col("members.tf").as("tfs"))
      .as[(String, Long, Array[Long], Array[Long])]
      .mapPartitions(_.map { case (term, block, ids, tfs) =>
        val bytes = encodeBlock(ids)
        var bs = 0L
        var i = 0
        while (i < bytes.length) { bs += bytes(i) & 0xff; i += 1 }
        Block(term, block, ids.length.toLong, tfs.max, bytes.length.toLong, bs, bytes)
      })
      .toDF()
  }
}

/** Encoder row of [[PostingsCodec.blockedPostings]]. Top-level (not nested
  * in the object) so the generated encoder code compiles — Janino rejects
  * accessor calls on `PostingsCodec$Block`-style nested classes and every
  * blocked-postings stage silently falls back to interpreted serializers. */
final case class Block(term: String, block: Long, n_docs: Long,
                       max_tf: Long, n_bytes: Long, byte_sum: Long,
                       bytes: Array[Byte])

/** Encoder row of [[PostingsCodec.blocksOf]] — see [[Block]] for why
  * top-level. */
final case class Block2(term: String, block: Long, n_docs: Long,
                        max_tf: Long, ids: Array[Byte], tfs: Array[Byte])
