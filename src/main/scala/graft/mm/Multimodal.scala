package graft.mm

import org.apache.spark.sql.{Dataset, SparkSession}

/** Multimodal column plumbing: image/audio/video travel as opaque BINARY
  * columns with typed metadata, processed by batched `mapPartitions` stages
  * (the JVM analog of `mapInPandas` — same batch shape, same schema
  * discipline, codec amortized per partition).
  *
  * All three modalities have REAL from-scratch decoders for published
  * formats: images — binary PPM (P6, Netpbm) with comments/whitespace
  * handling and ITU-R BT.601 luma, plus the `GIMG` test format; audio —
  * RIFF/WAV PCM ([[decodeWav]]: chunk walk, LE int16 + 8-bit); video —
  * the AVI container ([[decodeAvi]]: hdrl/avih header, movi frame list,
  * 8-bit grayscale DIB frames). Compressed codecs (JPEG/MP3/H.264) are
  * NOT in this container; their place in the pipeline is exactly these
  * dispatches: a production build adds cases without touching any plan
  * shape.
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

  /** Decode an image payload to (width, height, 8-bit luma pixels).
    * Dispatches on magic: binary PPM "P6" (real format, parsed below) or
    * the GIMG test format. Unknown/corrupt payloads return Left(reason) —
    * error rows, never task failures. */
  def decodeImage(bytes: Array[Byte]): Either[String, (Int, Int, Array[Int])] = {
    if (bytes == null || bytes.length < 8) return Left("truncated_header")
    if (bytes(0) == 'P' && bytes(1) == '6') return decodePpm(bytes)
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

  /** Binary PPM (Netpbm P6) decoder, from scratch per the published spec:
    * "P6", then whitespace-separated width/height/maxval tokens —
    * `#`-comments legal between tokens — one whitespace byte, then
    * width*height RGB triplets. Luma per ITU-R BT.601 integer form
    * (r*299 + g*587 + b*114) / 1000. maxval must fit one byte. */
  private[mm] def decodePpm(bytes: Array[Byte]): Either[String, (Int, Int, Array[Int])] = {
    var i = 2 // past "P6"
    def skipWsAndComments(): Boolean = {
      var progressed = true
      while (progressed && i < bytes.length) {
        progressed = false
        while (i < bytes.length && Character.isWhitespace(bytes(i).toChar)) { i += 1; progressed = true }
        if (i < bytes.length && bytes(i) == '#') {
          while (i < bytes.length && bytes(i) != '\n') i += 1
          progressed = true
        }
      }
      i < bytes.length
    }
    def readInt(): Int = {
      if (!skipWsAndComments()) return -1
      var v = 0L
      var any = false
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        v = v * 10 + (bytes(i) - '0'); any = true
        if (v > Int.MaxValue) return -1
        i += 1
      }
      if (any) v.toInt else -1
    }
    val w = readInt(); val h = readInt(); val maxval = readInt()
    if (w <= 0 || h <= 0 || maxval <= 0) return Left("ppm_bad_header")
    if (maxval > 255) return Left("ppm_maxval_unsupported")
    i += 1 // the single whitespace byte after maxval
    val n = w.toLong * h
    if (n > Int.MaxValue / 4 || bytes.length - i < n * 3) return Left("truncated_payload")
    val px = new Array[Int](n.toInt)
    var p = 0
    while (p < px.length) {
      val r = bytes(i) & 0xff; val g = bytes(i + 1) & 0xff; val b = bytes(i + 2) & 0xff
      px(p) = (r * 299 + g * 587 + b * 114) / 1000
      i += 3; p += 1
    }
    Right((w, h, px))
  }

  /** Binary PPM encoder (test/fixture helper — also a usable S7-style
    * export for image payloads). */
  def ppm(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3, "rgb length must be w*h*3")
    val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
    header ++ rgb
  }

  final case class AudioFeature(
      media_id: Long,
      sample_rate: Int,
      channels: Int,
      n_frames: Long,
      mean_abs: Double, // mean absolute sample amplitude across channels
      err: String)

  /** RIFF/WAV PCM decoder, from scratch per the published RIFF spec:
    * "RIFF" + chunk size + "WAVE", then a chunk walk — unknown chunks
    * (LIST, fact, ...) skipped by their declared size, word-aligned — until
    * "fmt " (must be PCM: audioFormat == 1, bits 8 or 16) and "data".
    * Returns (sampleRate, channels, interleaved samples as Int — 16-bit
    * signed LE or 8-bit unsigned shifted to signed). Corrupt payloads are
    * Left(reason) error rows, never task failures. */
  def decodeWav(bytes: Array[Byte]): Either[String, (Int, Int, Array[Int])] = {
    def u16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def u32(o: Int): Long =
      (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    def tag(o: Int): String = new String(bytes, o, 4, "US-ASCII")
    if (bytes == null || bytes.length < 12) return Left("truncated_header")
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return Left("bad_magic")
    var i = 12
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    while (i + 8 <= bytes.length) {
      val id = tag(i)
      val sz = u32(i + 4)
      if (sz < 0 || i + 8 + sz > bytes.length) return Left("truncated_chunk")
      val body = i + 8
      if (id == "fmt ") {
        if (sz < 16) return Left("wav_bad_fmt")
        if (u16(body) != 1) return Left("wav_not_pcm")
        val bits = u16(body + 14)
        if (bits != 8 && bits != 16) return Left("wav_bits_unsupported")
        fmt = Some((u16(body + 2), u32(body + 4).toInt, bits))
      } else if (id == "data") {
        val (ch, rate, bits) = fmt.getOrElse(return Left("wav_data_before_fmt"))
        if (ch <= 0 || rate <= 0) return Left("wav_bad_fmt")
        val bytesPer = bits / 8
        val n = (sz / bytesPer).toInt
        val out = new Array[Int](n)
        var s = 0
        while (s < n) {
          out(s) =
            if (bits == 16) u16(body + s * 2).toShort.toInt
            else (bytes(body + s) & 0xff) - 128
          s += 1
        }
        return Right((rate, ch, out))
      }
      i = body + sz.toInt + (sz.toInt & 1) // RIFF chunks are word-aligned
    }
    Left("wav_no_data_chunk")
  }

  /** WAV PCM-16 encoder (test/fixture helper and S7-style audio export).
    * `junkChunk` inserts a LIST chunk between fmt and data to exercise the
    * decoder's chunk walk. */
  def wav(rate: Int, channels: Int, samples: Array[Short],
          junkChunk: Boolean = false): Array[Byte] = {
    val dataLen = samples.length * 2
    val junk = if (junkChunk) Array[Byte]('L', 'I', 'S', 'T', 6, 0, 0, 0,
      'I', 'N', 'F', 'O', 'x', 0) else Array.emptyByteArray
    val riffLen = 4 + (8 + 16) + junk.length + (8 + dataLen)
    val bb = java.nio.ByteBuffer.allocate(8 + riffLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(riffLen).put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(rate)
      .putInt(rate * channels * 2).putShort((channels * 2).toShort).putShort(16)
    bb.put(junk)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Audio feature stage: same batched mapPartitions shape and error-row
    * discipline as [[imageFeatures]]. */
  def audioFeatures(media: Dataset[MediaRow])(implicit spark: SparkSession): Dataset[AudioFeature] = {
    import spark.implicits._
    media.mapPartitions(_.map { m =>
      decodeWav(m.bytes) match {
        case Left(err) => AudioFeature(m.media_id, 0, 0, 0L, 0.0, err)
        case Right((rate, ch, samples)) =>
          var sum = 0L; var i = 0
          while (i < samples.length) { sum += math.abs(samples(i)); i += 1 }
          AudioFeature(m.media_id, rate, ch, samples.length.toLong / ch,
            sum.toDouble / math.max(samples.length, 1), "")
      }
    })
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

  /** Minimal AVI (RIFF 'AVI ') parser, from scratch per the published
    * container layout: RIFF form 'AVI ', a LIST 'hdrl' whose 'avih' chunk
    * carries dwMicroSecPerFrame / dwTotalFrames / dwWidth / dwHeight at
    * their fixed MainAVIHeader offsets, and a LIST 'movi' whose
    * '00db'/'00dc' chunks are the frames — here 8-bit grayscale DIBs of
    * width*height luma bytes. Compressed codecs slot into the same frame
    * dispatch. Returns (width, height, usPerFrame, frames). */
  def decodeAvi(bytes: Array[Byte]): Either[String, (Int, Int, Long, Seq[Array[Int]])] = {
    def u32(o: Int): Long =
      (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    def tag(o: Int): String = new String(bytes, o, 4, "US-ASCII")
    if (bytes == null || bytes.length < 12) return Left("truncated_header")
    if (tag(0) != "RIFF" || tag(8) != "AVI ") return Left("bad_magic")
    var w = -1; var h = -1; var usPerFrame = -1L
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
    var i = 12
    while (i + 8 <= bytes.length) {
      val id = tag(i)
      val sz = u32(i + 4)
      if (i + 8 + sz > bytes.length) return Left("truncated_chunk")
      val body = i + 8
      if (id == "LIST" && sz >= 4) {
        tag(body) match {
          case "hdrl" =>
            // walk the header list for avih
            var j = body + 4
            val end = body + sz.toInt
            while (j + 8 <= end) {
              val csz = u32(j + 4)
              if (tag(j) == "avih") {
                if (csz < 40) return Left("avi_bad_header")
                usPerFrame = u32(j + 8)
                w = u32(j + 8 + 32).toInt
                h = u32(j + 8 + 36).toInt
              }
              j += 8 + csz.toInt + (csz.toInt & 1)
            }
          case "movi" =>
            if (w <= 0 || h <= 0) return Left("avi_frames_before_header")
            var j = body + 4
            val end = body + sz.toInt
            while (j + 8 <= end) {
              val cid = tag(j)
              val csz = u32(j + 4)
              if (j + 8 + csz > end) return Left("truncated_chunk")
              if (cid == "00db" || cid == "00dc") {
                if (csz != w.toLong * h) return Left("avi_frame_size_mismatch")
                val px = new Array[Int](w * h)
                var p = 0
                while (p < px.length) { px(p) = bytes(j + 8 + p) & 0xff; p += 1 }
                frames += px
              }
              j += 8 + csz.toInt + (csz.toInt & 1)
            }
          case _ => // other lists skipped whole
        }
      }
      i = body + sz.toInt + (sz.toInt & 1)
    }
    if (w <= 0 || h <= 0) Left("avi_no_header")
    else Right((w, h, usPerFrame, frames.toSeq))
  }

  /** AVI encoder (test/fixture helper): 8-bit grayscale frames. */
  def avi(width: Int, height: Int, usPerFrame: Long, frames: Seq[Array[Byte]]): Array[Byte] = {
    require(frames.forall(_.length == width * height), "frame length must be w*h")
    val avih = java.nio.ByteBuffer.allocate(8 + 56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    avih.put("avih".getBytes("US-ASCII")).putInt(56)
      .putInt(usPerFrame.toInt).putInt(0).putInt(0).putInt(0)
      .putInt(frames.length).putInt(0).putInt(1).putInt(0)
      .putInt(width).putInt(height).putInt(0).putInt(0).putInt(0).putInt(0)
    val hdrl = "hdrl".getBytes("US-ASCII") ++ avih.array()
    val movi = "movi".getBytes("US-ASCII") ++ frames.flatMap { f =>
      val ch = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      ch.put("00db".getBytes("US-ASCII")).putInt(f.length)
      ch.array() ++ f ++ (if (f.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray)
    }
    def list(payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("LIST".getBytes("US-ASCII")).putInt(payload.length)
      bb.array() ++ payload
    }
    val payload = "AVI ".getBytes("US-ASCII") ++ list(hdrl) ++ list(movi)
    val bb = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(payload.length)
    bb.array() ++ payload
  }

  /** Frame-sampling stage for video payloads: every `strideFrames`-th frame
    * of the REAL decoded AVI stream becomes one row with its timestamp and
    * mean luma — the UDTF/generator shape (1 row in, N out), error rows
    * never failures. */
  def sampleFrames(media: Dataset[MediaRow], strideFrames: Int)
                  (implicit spark: SparkSession): Dataset[FrameSample] = {
    import spark.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      decodeAvi(m.bytes) match {
        case Left(_) => Nil
        case Right((_, _, usPerFrame, frames)) =>
          frames.zipWithIndex.collect {
            case (px, idx) if idx % strideFrames == 0 =>
              var sum = 0L; var p = 0
              while (p < px.length) { sum += px(p); p += 1 }
              FrameSample(m.media_id, idx, idx * usPerFrame / 1000,
                sum.toDouble / math.max(px.length, 1))
          }
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
