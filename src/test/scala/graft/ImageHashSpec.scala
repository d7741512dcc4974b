package graft

import graft.mm.{ImageHash, Multimodal}
import graft.mm.Multimodal.MediaRow

/** Perceptual image near-dup: aHash bit arithmetic, planted-pair
  * detection through the real PPM decoder, banding == brute force,
  * error-row skipping. */
class ImageHashSpec extends SparkSuiteBase {
  import spark.implicits._

  test("aHash: cross-multiplied mean compare, hand-checked 8x8") {
    // top 4 rows (cells 0..31) luma 200, bottom 4 rows 40: mean 120 —
    // exactly the top half's bits set
    val px = Array.fill(32)(200) ++ Array.fill(32)(40)
    assert(ImageHash.aHash64(8, 8, px) == 0x00000000FFFFFFFFL)
    // uniform image: every cell TIES the mean (strict >) — all bits 0
    assert(ImageHash.aHash64(10, 9, Array.fill(90)(77)) == 0L)
  }

  private def ppmRow(id: Long, w: Int, h: Int, luma: Array[Int]): MediaRow = {
    val rgb = new Array[Byte](w * h * 3)
    var p = 0
    while (p < w * h) {
      val v = luma(p).toByte
      rgb(p * 3) = v; rgb(p * 3 + 1) = v; rgb(p * 3 + 2) = v
      p += 1
    }
    MediaRow(id, "image", Multimodal.ppm(w, h, rgb), w, h, "ppm")
  }

  test("planted near-dup pairs through the real PPM decoder") {
    // 16x16, 2x2-pixel cells; checkerboard by cell parity
    def base(p: Int): Int = {
      val c = ((p / 16) * 8 / 16) * 8 + ((p % 16) * 8 / 16)
      if ((c / 8 + c % 8) % 2 == 0) 200 else 40
    }
    val a = ppmRow(1, 16, 16, Array.tabulate(256)(base))
    val b = ppmRow(2, 16, 16, Array.tabulate(256) { p =>
      val c = ((p / 16) * 8 / 16) * 8 + ((p % 16) * 8 / 16)
      if (c == 0) 40 else base(p) // cell 0 forced below the mean: 1 bit
    })
    val c = ppmRow(3, 16, 16, Array.tabulate(256) { p =>
      val cell = ((p / 16) * 8 / 16) * 8 + ((p % 16) * 8 / 16)
      if ((cell * 37 + 11) % 5 < 2) 210 else 30 // unrelated pattern
    })
    val got = ImageHash.imageNearDup(Seq(a, b, c).toDS())(spark)
      .as[(String, String, Int)].collect().toSet
    assert(got == Set(("1", "2", 1)))
  }

  test("banding equals brute force on a random corpus with planted twins") {
    val bases = (0L until 40L).map(i => Multimodal.fakeImage(i, 16, 16))
    // deterministic twin pair: strong checkerboard + a single-cell flip —
    // immune to the global-mean drift a mutation of a RANDOM image causes
    def cb(flip: Boolean)(p: Int): Int = {
      val c = ((p / 16) * 8 / 16) * 8 + ((p % 16) * 8 / 16)
      if (flip && c == 0) 40
      else if ((c / 8 + c % 8) % 2 == 0) 200 else 40
    }
    val twins = Seq(
      ppmRow(100L, 16, 16, Array.tabulate(256)(cb(flip = false))),
      ppmRow(101L, 16, 16, Array.tabulate(256)(cb(flip = true))))
    val all = bases ++ twins
    val got = ImageHash.imageNearDup(all.toDS())(spark)
      .as[(String, String, Int)].collect().toSet
    val hashes = all.map { m =>
      val Right((w, h, px)) = Multimodal.decodeImage(m.bytes)
      m.media_id.toString -> ImageHash.aHash64(w, h, px)
    }
    val brute = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes
      if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb)
      if d <= 3
    } yield (ia, ib, d)).toSet
    assert(got == brute)
    assert(brute.nonEmpty, "planted twins should land within distance 3")
  }

  test("undecodable payloads are skipped, never failed") {
    val ok = ppmRow(1, 8, 8, Array.fill(64)(99))
    val bad = MediaRow(2, "image", Array[Byte](1, 2, 3), 0, 0, "junk")
    val got = ImageHash.imageNearDup(Seq(ok, bad).toDS())(spark).collect()
    assert(got.isEmpty)
  }
}
