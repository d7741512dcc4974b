package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.mm.Multimodal
import graft.mm.Multimodal.MediaRow
import graft.streaming.StreamExtract
import graft.corpus.PageGen

class MultimodalStreamSpec extends SparkSuiteBase {
  import spark.implicits._
  implicit lazy val s: org.apache.spark.sql.SparkSession = spark

  test("image features: schema, determinism, histogram normalization") {
    val media = spark.createDataset((0L until 50L).map(i => Multimodal.fakeImage(i, 32, 24)))
    val feats = Multimodal.imageFeatures(media).collect().sortBy(_.media_id)
    assert(feats.length == 50)
    assert(feats.forall(_.err == ""))
    assert(feats.forall(f => math.abs(f.histogram.sum - 1.0) < 1e-9))
    assert(feats.forall(f => f.mean_luma > 0 && f.mean_luma < 255))
    // deterministic: second run identical
    val again = Multimodal.imageFeatures(media).collect().sortBy(_.media_id)
    assert(feats.map(_.mean_luma).toSeq == again.map(_.mean_luma).toSeq)
  }

  test("corrupt media yields err rows, not task failures") {
    val bad = Seq(
      MediaRow(1L, "image", Array[Byte](1, 2, 3), 10, 10, "gimg"),
      MediaRow(2L, "image", "JUNKPAYLOADBYTES".getBytes, 10, 10, "gimg"),
      MediaRow(3L, "image", Multimodal.fakeImage(3, 8, 8).bytes.take(20), 8, 8, "gimg"))
    val feats = Multimodal.imageFeatures(spark.createDataset(bad)).collect().sortBy(_.media_id)
    assert(feats.map(_.err).toSeq == Seq("truncated_header", "bad_magic", "truncated_payload"))
  }

  test("frame sampling decodes the real AVI container: 1 video row -> N frame rows") {
    // 6 frames of 2x2 gray, frame f all-pixels = 10*f -> mean luma = 10*f
    val frames6 = (0 until 6).map(f => Array.fill[Byte](4)((10 * f).toByte))
    val bytes = Multimodal.avi(2, 2, usPerFrame = 40000L, frames6)
    // decoder roundtrip: header + every frame byte
    val Right((w, h, us, decoded)) = Multimodal.decodeAvi(bytes)
    assert(w == 2 && h == 2 && us == 40000L && decoded.length == 6)
    assert(decoded(3).toSeq == Seq(30, 30, 30, 30))
    val vid = MediaRow(9L, "video", bytes, 2, 2, "avi")
    val out = Multimodal.sampleFrames(spark.createDataset(Seq(vid)), strideFrames = 2)
      .collect().sortBy(_.frame_idx)
    assert(out.map(_.frame_idx).toSeq == Seq(0, 2, 4))
    assert(out.map(_.mean_luma).toSeq == Seq(0.0, 20.0, 40.0))
    assert(out.map(_.ts_ms).toSeq == Seq(0L, 80L, 160L))
    // corrupt payloads vanish as empty generators, not failures
    assert(Multimodal.sampleFrames(
      spark.createDataset(Seq(vid.copy(bytes = Array[Byte](1, 2, 3)))), 1).count() == 0)
  }

  test("resize metadata keeps aspect, caps max dim") {
    val media = spark.createDataset(Seq(
      Multimodal.fakeImage(1, 64, 32), Multimodal.fakeImage(2, 16, 16)))
    val out = Multimodal.resizeMeta(media, 32).collect().sortBy(_.media_id)
    assert(out(0).width == 32 && out(0).height == 16) // scaled
    assert(out(1).width == 16 && out(1).height == 16) // untouched
  }

  test("streaming extraction: MemoryStream pages -> chunk rows per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[PageRow]
    val chunks = StreamExtract.extractStream(stream.toDS())
    val q = chunks.writeStream.format("memory").queryName("chunks_out")
      .outputMode("append").start()
    try {
      stream.addData((0L until 30L).map(i => PageGen.row(42L, i)))
      q.processAllAvailable()
      val n1 = spark.sql("SELECT count(*) FROM chunks_out").head().getLong(0)
      assert(n1 > 0)
      stream.addData((30L until 60L).map(i => PageGen.row(42L, i)))
      q.processAllAvailable()
      val n2 = spark.sql("SELECT count(*) FROM chunks_out").head().getLong(0)
      assert(n2 > n1)
      // streamed results == batch results over the same input
      val batch = (0L until 60L).flatMap { i =>
        val p = PageGen.row(42L, i)
        val d = graft.extract.Extract.extractOne(p.url, p.html)
        if (d.err.isEmpty && d.text.nonEmpty)
          graft.chunk.Chunker.chunkDocument(d.url, Hashing.sha256Hex(d.text), d.text) else Nil
      }
      assert(n2 == batch.length)
      val streamedIds = spark.sql("SELECT id FROM chunks_out").as[String].collect().toSet
      assert(streamedIds == batch.map(_.id).toSet)
    } finally q.stop()
  }

  test("windowed event counts with watermark aggregate by event time") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = stream.toDS().toDF("ts", "event_type", "value")
    val agg = StreamExtract.eventCounts(df)
    val q = agg.writeStream.format("memory").queryName("ev_out")
      .outputMode("append").start()
    try {
      def ts(min: Int) = new java.sql.Timestamp(3600000L * 10 + min * 60000L)
      stream.addData((ts(0), "click", 1.0), (ts(1), "click", 2.0), (ts(6), "view", 3.0))
      q.processAllAvailable()
      // advance watermark far enough to close the first windows
      stream.addData((ts(60), "click", 9.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT event_type, cnt, total FROM ev_out ORDER BY event_type")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(rows.contains(("click", 2L, 3.0)))
      assert(rows.contains(("view", 1L, 3.0)))
    } finally q.stop()
  }

  test("AvailableNow file-stream drains the pages table once and resumes via checkpoint") {
    import java.nio.file.Files
    val base = Files.createTempDirectory("graft-stream").toString
    val pagesDir = s"$base/pages"
    val outDir = s"$base/chunks"
    val ckpt = s"$base/ckpt"

    // first batch of pages on disk
    spark.range(40).map(i => PageGen.row(42L, i))
      .write.mode("overwrite").parquet(pagesDir)

    def runOnce(): Long = {
      val pagesStream = spark.readStream
        .schema(spark.read.parquet(pagesDir).schema)
        .parquet(pagesDir)
        .as[PageRow]
      val chunks = StreamExtract.extractStream(pagesStream)
      val q = StreamExtract.availableNowWriter(chunks, outDir, ckpt).start()
      q.awaitTermination()
      spark.read.parquet(outDir).count()
    }

    val n1 = runOnce()
    assert(n1 > 0)
    // re-run with NO new files: checkpoint says everything is processed
    val n1b = runOnce()
    assert(n1b == n1, "rerun without new data must not reprocess")
    // append more pages -> only the new files are processed
    spark.range(40, 80).map(i => PageGen.row(42L, i))
      .write.mode("append").parquet(pagesDir)
    val n2 = runOnce()
    assert(n2 > n1)
    // streamed total == batch over all 80 pages (exactly-once, no dupes)
    val batch = (0L until 80L).flatMap { i =>
      val p = PageGen.row(42L, i)
      val d = graft.extract.Extract.extractOne(p.url, p.html)
      if (d.err.isEmpty && d.text.nonEmpty)
        graft.chunk.Chunker.chunkDocument(d.url, Hashing.sha256Hex(d.text), d.text) else Nil
    }
    assert(n2 == batch.length)
  }

  test("binary PPM (P6): real published format decodes — header, comments, BT.601 luma") {
    val rgb = Array[Byte](
      255.toByte, 0, 0,   0, 255.toByte, 0,   0, 0, 255.toByte,            // red green blue
      255.toByte, 255.toByte, 255.toByte,   0, 0, 0,   128.toByte, 128.toByte, 128.toByte) // white black gray
    val bytes = Multimodal.ppm(3, 2, rgb)
    val Right((w, h, px)) = Multimodal.decodeImage(bytes): @unchecked
    assert(w == 3 && h == 2)
    // integer BT.601: (r*299 + g*587 + b*114) / 1000
    assert(px.toSeq == Seq(76, 149, 29, 255, 0, 128))

    // comments and arbitrary whitespace between header tokens are legal
    val commented = "P6\n# made by graft\n 3 # width\n\t2\n255\n".getBytes("ISO-8859-1") ++ rgb
    val Right((w2, h2, px2)) = Multimodal.decodeImage(commented): @unchecked
    assert(w2 == w && h2 == h && px2.toSeq == px.toSeq)

    // corrupt payloads become error reasons, never exceptions
    assert(Multimodal.decodeImage(bytes.dropRight(2)).isLeft)
    assert(Multimodal.decodeImage("P6\n3 2\n65535\n".getBytes("ISO-8859-1") ++ rgb) ==
      Left("ppm_maxval_unsupported"))
  }

  test("RIFF/WAV PCM: real published format decodes — chunk walk, LE int16, 8-bit") {
    val samples = Array[Short](0, 1000, -1000, 32767, -32768, 5)
    // roundtrip, with and without a junk LIST chunk between fmt and data
    for (junk <- Seq(false, true)) {
      val Right((rate, ch, out)) = Multimodal.decodeWav(
        Multimodal.wav(16000, 2, samples, junkChunk = junk))
      assert(rate == 16000 && ch == 2)
      assert(out.toSeq == samples.map(_.toInt).toSeq)
    }
    // 8-bit unsigned path, hand-built: values shift to signed around 128
    val bytes8 = {
      val bb = java.nio.ByteBuffer.allocate(8 + 4 + 24 + 11)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(4 + 24 + 11).put("WAVE".getBytes)
      bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1).putInt(8000)
        .putInt(8000).putShort(1).putShort(8)
      bb.put("data".getBytes).putInt(3).put(0.toByte).put(128.toByte).put(255.toByte)
      bb.array()
    }
    val Right((r8, c8, o8)) = Multimodal.decodeWav(bytes8)
    assert(r8 == 8000 && c8 == 1 && o8.toSeq == Seq(-128, 0, 127))
    // error rows, never failures
    assert(Multimodal.decodeWav("RIFX----WAVE".getBytes).isLeft)
    assert(Multimodal.decodeWav(Multimodal.wav(8000, 1, samples).dropRight(3)).isLeft)
    val notPcm = Multimodal.wav(8000, 1, samples)
    notPcm(20) = 3 // audioFormat = IEEE float
    assert(Multimodal.decodeWav(notPcm) == Left("wav_not_pcm"))
  }

  test("WAV rows flow through the audioFeatures stage; corrupt rows become err rows") {
    val media = Seq(
      MediaRow(1L, "audio", Multimodal.wav(8000, 1, Array[Short](100, -200, 300)), 0, 0, "wav"),
      MediaRow(2L, "audio", Array[Byte](1, 2, 3), 0, 0, "wav")).toDS()
    val feats = Multimodal.audioFeatures(media).collect().sortBy(_.media_id)
    assert(feats(0).err.isEmpty && feats(0).sample_rate == 8000 &&
      feats(0).n_frames == 3 && math.abs(feats(0).mean_abs - 200.0) < 1e-9)
    assert(feats(1).err == "truncated_header")
  }

  test("PPM rows flow through the imageFeatures stage like any other payload") {
    val rgb = Array[Byte](255.toByte, 0, 0, 0, 255.toByte, 0, 0, 0, 255.toByte,
      255.toByte, 255.toByte, 255.toByte, 0, 0, 0, 128.toByte, 128.toByte, 128.toByte)
    val media = Seq(
      MediaRow(1L, "image", Multimodal.ppm(3, 2, rgb), 3, 2, "ppm"),
      Multimodal.fakeImage(2L, 4, 4)).toDS()
    val feats = Multimodal.imageFeatures(media).collect().sortBy(_.media_id)
    assert(feats.forall(_.err.isEmpty))
    val ppmFeat = feats.head
    assert(ppmFeat.width == 3 && ppmFeat.height == 2)
    assert(math.abs(ppmFeat.mean_luma - (76 + 149 + 29 + 255 + 0 + 128) / 6.0) < 1e-9)
  }
}
