package graft.mm

import org.apache.spark.sql.{Dataset, SparkSession}

/** Multimodal column plumbing: image/audio/video travel as opaque BINARY
  * columns with typed metadata, processed by batched `mapPartitions` stages
  * (the JVM analog of `mapInPandas` — same batch shape, same schema
  * discipline, codec amortized per partition).
  *
  * The actual codecs (JPEG decode, resampling, frame extraction) are NOT in
  * this container, so `decodeImage` below is a clearly-marked deterministic
  * STUB: it parses only our own PPM-like header and synthesizes pixel
  * statistics from the payload bytes. The Spark-side plumbing — schema,
  * partitioning, batch iteration, null/error rows — is real and tested; a
  * production build swaps `decodeImage` for a real codec without touching
  * any plan shape.
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long,
      kind: String,           // image | audio | video
      bytes: Array[Byte],     // opaque payload
      width: Int, height: Int, // typed metadata carried alongside
      format: String)

  final case class ImageFeature(
      media_id: Long,
      width: Int,
      height: Int,
      mean_luma: Double,
      histogram: Array[Double], // 16-bin luma histogram
      err: String)

  final case class FrameSample(media_id: Long, frame_idx: Int, ts_ms: Long, mean_luma: Double)

  /** Deterministic fake "image": magic header `GIMG` + width + height +
    * width*height payload bytes derived from a seed. */
  def fakeImage(id: Long, width: Int, height: Int): MediaRow = {
    val n = width * height
    val bytes = new Array[Byte](8 + n)
    bytes(0) = 'G'; bytes(1) = 'I'; bytes(2) = 'M'; bytes(3) = 'G'
    bytes(4) = (width >> 8).toByte; bytes(5) = width.toByte
    bytes(6) = (height >> 8).toByte; bytes(7) = height.toByte
    var i = 0
    while (i < n) {
      bytes(8 + i) = (graft.Hashing.mix64(id * 1000003L + i) >>> 24).toByte
      i += 1
    }
    MediaRow(id, "image", bytes, width, height, "gimg")
  }

  /** STUB DECODER — deterministic fake standing in for a real image codec
    * (not available in this container). Real plumbing, fake pixels. */
  def decodeImage(bytes: Array[Byte]): Either[String, (Int, Int, Array[Int])] = {
    if (bytes == null || bytes.length < 8) return Left("truncated_header")
    if (!(bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'M' && bytes(3) == 'G'))
      return Left("bad_magic")
    val w = ((bytes(4) & 0xff) << 8) | (bytes(5) & 0xff)
    val h = ((bytes(6) & 0xff) << 8) | (bytes(7) & 0xff)
    if (bytes.length < 8 + w * h) return Left("truncated_payload")
    val px = new Array[Int](w * h)
    var i = 0
    while (i < w * h) { px(i) = bytes(8 + i) & 0xff; i += 1 }
    Right((w, h, px))
  }

  /** Feature extraction stage: one batched mapPartitions pass, error rows
    * instead of task failures (same discipline as Extract). */
  def imageFeatures(media: Dataset[MediaRow])(implicit spark: SparkSession): Dataset[ImageFeature] = {
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition codec init would go here (amortized, like the
      // reference's per-process OCR model warm init, SURVEY.md §2.10 P2)
      it.map { m =>
        decodeImage(m.bytes) match {
          case Left(err) => ImageFeature(m.media_id, m.width, m.height, 0.0, Array.fill(16)(0.0), err)
          case Right((w, h, px)) =>
            val hist = new Array[Double](16)
            var sum = 0L
            var i = 0
            while (i < px.length) { sum += px(i); hist(px(i) >> 4) += 1; i += 1 }
            var b = 0
            while (b < 16) { hist(b) /= math.max(px.length, 1); b += 1 }
            ImageFeature(m.media_id, w, h, sum.toDouble / math.max(px.length, 1), hist, "")
        }
      }
    }
  }

  /** Frame-sampling stage for "video" payloads: every `strideMs`, one
    * synthetic frame row — the UDTF/generator shape (1 row in, N out). */
  def sampleFrames(media: Dataset[MediaRow], strideMs: Long, durationMs: Long)
                  (implicit spark: SparkSession): Dataset[FrameSample] = {
    import spark.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      (0L until durationMs by strideMs).zipWithIndex.map { case (ts, idx) =>
        // STUB: luma derived from payload hash + ts; a real build decodes
        // the container and pulls the nearest keyframe
        val luma = ((graft.Hashing.mix64(m.media_id ^ ts) >>> 32) % 256).toDouble
        FrameSample(m.media_id, idx, ts, luma)
      }
    }
  }

  /** "Resize" metadata transform: pure plan-side arithmetic on the typed
    * metadata, payload untouched (real resize = codec stage). */
  def resizeMeta(media: Dataset[MediaRow], maxDim: Int)(implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    media.map { m =>
      val scale = math.min(1.0, maxDim.toDouble / math.max(math.max(m.width, m.height), 1))
      m.copy(width = math.max(1, (m.width * scale).toInt),
             height = math.max(1, (m.height * scale).toInt))
    }
  }
}
