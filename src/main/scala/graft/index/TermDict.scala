package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Front-coded term dictionary — the OTHER half of the index storage
  * bill beside the posting lists ([[PostingsCodec]]): the sorted vocab
  * splits into `blockSize`-term blocks; each block's first term is
  * stored whole (the block is a random-access seek point), every later
  * term as (lcp, suffix) against its predecessor — varint(lcp) +
  * varint(|suffix|) + suffix bytes (Witten–Moffat–Bell "Managing
  * Gigabytes" §4; the Lucene term-block layout). Sorted dictionaries
  * share long prefixes, so the shared-prefix bytes vanish.
  *
  * Scale note — the defining quantity is a GLOBAL dense rank over the
  * sorted vocab, and a global-order window collapses the vocab into ONE
  * task (the [[graft.text.Sharding]] lesson). Rank comes from the same
  * two-pass scan: range-partition + in-partition sort on term,
  * per-partition (count, last term) to the driver — numPartitions tiny
  * rows — exclusive offsets + boundary terms broadcast back, local
  * enumeration. The boundary term is what lets the first row of a
  * partition front-code against its true global predecessor.
  * Deterministic for any partition count (pinned by spec).
  *
  * All integer/string arithmetic over the REAL emitted bytes (n_bytes /
  * byte_sum come from the encoder's output, never recomputed), so the
  * driver oracle gates the encoder against closed-form SQL: lcp by
  * monotone prefix counting, varint lengths by 7-bit range cases, byte
  * sums as Σ 7-bit fields + 128 per continuation + Σ ascii codes. */
object TermDict {

  private def varintLen(v: Long): Int = {
    var x = v; var n = 1
    while ((x & ~0x7fL) != 0L) { x >>>= 7; n += 1 }
    n
  }

  /** Front-code one row given its predecessor; returns (lcp, suffix,
    * n_bytes, byte_sum) over the real encoded bytes. */
  private[index] def encodeEntry(term: String, prev: Option[String]): (Int, String, Long, Long) = {
    require(term.length < (1 << 14), s"term too long for the dictionary: ${term.length}")
    val lcp = prev.fold(0) { p =>
      val m = math.min(term.length, p.length)
      var i = 0
      while (i < m && term.charAt(i) == p.charAt(i)) i += 1
      i
    }
    val suffix = term.substring(lcp)
    val out = new java.io.ByteArrayOutputStream(suffix.length + 4)
    PostingsCodec.putVarint(lcp.toLong, out)
    PostingsCodec.putVarint(suffix.length.toLong, out)
    val sb = suffix.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    out.write(sb, 0, sb.length)
    val bytes = out.toByteArray
    var bs = 0L
    var i = 0
    while (i < bytes.length) { bs += bytes(i) & 0xff; i += 1 }
    (lcp, suffix, bytes.length.toLong, bs)
  }

  /** The front-coded dictionary of a corpus's vocabulary:
    * (term, block, pos, lcp, suffix, n_bytes, byte_sum). `pos` 0 rows
    * store the whole term (lcp forced 0 — seek points); later rows code
    * against the globally previous term even across partition borders. */
  def frontCoded(docs: DataFrame, textCol: String, blockSize: Int = 16,
                 partitions: Int = 0): DataFrame = {
    require(blockSize >= 1, s"blockSize $blockSize")
    val spark = docs.sparkSession
    import spark.implicits._
    val p = if (partitions > 0) partitions else spark.sparkContext.defaultParallelism
    val sorted = docs
      .select(explode(Bm25.tokensCol(col(textCol))).as("term"))
      .distinct()
      .repartitionByRange(p, col("term").asc)
      .sortWithinPartitions("term")
      .as[String]
    val rdd = sorted.rdd
    // pass 1 — per-partition count and last (max) term: p tiny rows
    val marks = rdd.mapPartitionsWithIndex { case (i, it) =>
      var n = 0L; var last: String = null
      it.foreach { t => n += 1; last = t }
      Iterator.single((i, n, Option(last)))
    }.collect().sortBy(_._1)
    val offsets = marks.scanLeft(0L)(_ + _._2).init
    // global predecessor of each partition's first row = the previous
    // NON-EMPTY partition's last term
    val prevTerm: Array[Option[String]] = {
      val out = Array.fill[Option[String]](marks.length)(None)
      var last: Option[String] = None
      marks.foreach { case (i, n, l) =>
        out(i) = last
        if (n > 0) last = l
      }
      out
    }
    val bcOff = spark.sparkContext.broadcast(offsets)
    val bcPrev = spark.sparkContext.broadcast(prevTerm)
    val b = blockSize.toLong
    rdd.mapPartitionsWithIndex { case (i, it) =>
      var rank0 = bcOff.value(i)
      var prev: Option[String] = bcPrev.value(i)
      it.map { term =>
        val block = rank0 / b
        val pos = rank0 % b
        val (lcp, suffix, nb, bs) = encodeEntry(term, if (pos == 0L) None else prev)
        rank0 += 1
        prev = Some(term)
        (term, block, pos, lcp.toLong, suffix, nb, bs)
      }
    }.toDF("term", "block", "pos", "lcp", "suffix", "n_bytes", "byte_sum")
  }
}
