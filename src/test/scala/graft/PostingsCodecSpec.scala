package graft

import graft.index.PostingsCodec

/** Blocked delta+varint postings: codec roundtrip at the 7-bit
  * boundaries, known-byte vectors, blocked layout + standalone block
  * decode, byte accounting, compression ratio. */
class PostingsCodecSpec extends SparkSuiteBase {
  import spark.implicits._

  test("varint roundtrip across the 7-bit boundaries") {
    val edges = Seq(0L, 1L, 126L, 127L, 128L, 129L, 16383L, 16384L,
      2097151L, 2097152L, 268435455L, 268435456L, (1L << 34) - 1, 1L << 34)
    // strictly ascending absolute ids built from the edge gaps
    val ids = edges.tail.scanLeft(edges.head)(_ + _ + 1).toArray
    assert(PostingsCodec.decodeBlock(PostingsCodec.encodeBlock(ids)).toSeq == ids.toSeq)
  }

  test("known byte vector: [3, 130] -> gap 127 stays one byte") {
    val bytes = PostingsCodec.encodeBlock(Array(3L, 130L))
    assert(bytes.toSeq == Seq(3.toByte, 127.toByte))
    // 300 = 0b100101100: LEB128 = [0xAC, 0x02]
    val b2 = PostingsCodec.encodeBlock(Array(300L))
    assert(b2.toSeq == Seq(0xAC.toByte, 0x02.toByte))
  }

  test("blocked layout: sizes, standalone decode, byte accounting") {
    // 300 docs share one term; ids 2*i keep gaps at 2
    val docs = (0 until 300).map(i => (2L * i, "shared term"))
    val rows = PostingsCodec.blockedPostings(
        docs.toDF("id", "text").repartition(4), "id", "text", blockSize = 128)
      .filter($"term" === "shared")
      .orderBy("block")
      .as[(String, Long, Long, Long, Long, Long, Array[Byte])].collect()
    assert(rows.map(r => (r._2, r._3)).toSeq == Seq((0L, 128L), (1L, 128L), (2L, 44L)))
    val decoded = rows.flatMap(r => PostingsCodec.decodeBlock(r._7))
    assert(decoded.toSeq == (0 until 300).map(2L * _))
    rows.foreach { r =>
      assert(r._5 == r._7.length.toLong)            // n_bytes
      assert(r._6 == r._7.map(_ & 0xff).map(_.toLong).sum) // byte_sum
      assert(r._4 == 1L)                            // max_tf
    }
    // dense gaps compress ~8x vs raw longs: 128 ids in ~129 bytes
    assert(rows.head._5 <= 130L)
  }

  test("max_tf is the block max, not the term max") {
    val docs = Seq((0L, "w w w w"), (200L, "w")) // gap forces same block though
    val rows = PostingsCodec.blockedPostings(docs.toDF("id", "text"), "id", "text", blockSize = 1)
      .orderBy("block").as[(String, Long, Long, Long, Long, Long, Array[Byte])].collect()
    assert(rows.map(_._4).toSeq == Seq(4L, 1L))
  }
}
