package graft.mm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Perceptual image near-duplicate detection — the visual member of the
  * dedup family (LAION-style image dedup; the reference's whole-file
  * sha256 skip, convert_to_embeddings.py:531-570, lifted to
  * perceptual content equality).
  *
  * Fingerprint: the published AVERAGE HASH (aHash) — downsample luma to
  * an 8×8 grid, one bit per cell: is the cell's mean above the global
  * mean? ALL-INTEGER arithmetic: cell membership is floor(y*8/h),
  * floor(x*8/w); the mean comparison is the cross-multiplication
  * `cellSum * totalCount > totalSum * cellCount` — no division, no
  * floats, so the DuckDB oracle replays the hash bit-for-bit from
  * planted pixel formulas (the q_mm_luma discipline).
  *
  * Scale path: the 64-bit fingerprints ride the PROVEN SimHash
  * pigeonhole machinery ([[graft.dedup.SimHash.nearDupPairsFromFingerprints]]):
  * 10 block-pair ~26-bit tables, exact for Hamming ≤ 3, per-bucket
  * `row_number ≤ cap` pre-cap (WindowGroupLimit, drops observable) —
  * pixels never shuffle, only (id, hash) rows do.
  */
object ImageHash {

  /** 8×8 average hash of a decoded luma raster. Bit c (= gy*8 + gx, LSB
    * first) is 1 iff cell c's mean luma strictly exceeds the image mean,
    * compared exactly by cross-multiplication. Images narrower/shorter
    * than 8 px leave the unreachable cells empty (bit 0). Exact for
    * rasters up to ~10^9 pixels (cellSum·total fits a Long). */
  def aHash64(w: Int, h: Int, px: Array[Int]): Long = {
    // loud contract at the decode boundary: a raster whose length
    // disagrees with w·h would index cells past 63 (or silently mis-bin)
    // — fail the row's task rather than emit a wrong fingerprint
    require(px.length == w.toLong * h,
      s"aHash64: raster length ${px.length} != ${w}x$h")
    val cs = new Array[Long](64)
    val cc = new Array[Long](64)
    var p = 0
    while (p < px.length) {
      val c = ((p / w) * 8 / h) * 8 + ((p % w) * 8 / w)
      cs(c) += px(p); cc(c) += 1
      p += 1
    }
    var ts = 0L
    var i = 0
    while (i < 64) { ts += cs(i); i += 1 }
    val tc = px.length.toLong
    var out = 0L
    var c = 0
    while (c < 64) {
      if (cs(c) * tc > ts * cc(c)) out |= (1L << c)
      c += 1
    }
    out
  }

  /** Near-dup image pairs (id_a, id_b, hamming) with aHash Hamming
    * distance ≤ maxDist. One narrow decode+hash map (pixels stay in
    * their scan partition), then the SimHash block-pair tables — exact
    * for maxDist ≤ 3, cap drops observable via `drops`. Undecodable
    * payloads are skipped (they have no perceptual content; the decode
    * ERROR ledger is [[Multimodal.imageFeatures]]'s job). */
  def imageNearDup(media: Dataset[Multimodal.MediaRow], maxDist: Int = 3,
                   maxBucket: Int = 64,
                   drops: Option[org.apache.spark.sql.Observation] = None)
                  (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val fp = media.mapPartitions(_.flatMap { m =>
      Multimodal.decodeImage(m.bytes) match {
        case Right((w, h, px)) => Iterator.single((m.media_id.toString, aHash64(w, h, px)))
        case Left(_)           => Iterator.empty
      }
    }).toDF("id", "sim")
    graft.dedup.SimHash.nearDupPairsFromFingerprints(fp, maxDist, maxBucket, drops)
  }
}
