package graft

import graft.corpus.WarcGen
import graft.warc.Warc

class WarcSpec extends SparkSuiteBase {

  private def rec(url: String, body: String): Array[Byte] =
    WarcGen.record(url, body.getBytes("UTF-8"))

  test("plain roundtrip: fields, offsets, payloads exact") {
    val bodies = Seq("doc://1" -> "hello world", "doc://2" -> "", "doc://3" -> "x" * 500)
    val file = WarcGen.file(bodies.map { case (u, b) => rec(u, b) })
    val rows = Warc.parseFile("a.warc", file)
    assert(rows.map(_.url) == bodies.map(_._1).toVector)
    assert(rows.map(r => new String(r.payload, "UTF-8")) == bodies.map(_._2).toVector)
    assert(rows.forall(_.warc_type == "response"))
    assert(rows.forall(_.warc_date == WarcGen.Date))
    assert(rows.map(_.rec_idx) == Vector(0L, 1L, 2L))
    // closed-form offsets: cumsum of FixedOverhead + len(url) + digits + len(body)
    val lens = bodies.map { case (u, b) =>
      WarcGen.FixedOverhead + u.length + b.getBytes("UTF-8").length.toString.length + b.getBytes("UTF-8").length
    }
    assert(rows.map(_.offset) == lens.scanLeft(0L)(_ + _).init.toVector)
    assert(rows.last.offset + lens.last == file.length)
  }

  test("member-gzip parses identically to plain, offsets in decoded stream") {
    val bodies = (0 until 7).map(i => s"doc://$i" -> s"payload number $i with some text " * (i + 1))
    val recs = bodies.map { case (u, b) => rec(u, b) }
    val plain = Warc.parseFile("f.warc", WarcGen.file(recs))
    val gz = Warc.parseFile("f.warc", WarcGen.gzFile(recs))
    assert(gz.map(r => (r.rec_idx, r.offset, r.url, r.content_length)) ==
      plain.map(r => (r.rec_idx, r.offset, r.url, r.content_length)))
    assert(gz.zip(plain).forall { case (a, b) => java.util.Arrays.equals(a.payload, b.payload) })
  }

  test("resync skips garbage between and around records") {
    val r1 = rec("doc://1", "first")
    val r2 = rec("doc://2", "second")
    val junk1 = "NOT A RECORD\r\n\r\n".getBytes("UTF-8")
    val junk2 = "WARC/1.0\r\nbroken header no blank line".getBytes("UTF-8") // truncated
    val bytes = junk1 ++ r1 ++ junk2 ++ r2 ++ junk1
    val rows = Warc.parseFile("g.warc", bytes)
    assert(rows.map(_.url) == Vector("doc://1", "doc://2"))
    assert(rows.map(_.rec_idx) == Vector(0L, 1L))
  }

  test("missing Content-Length or wrong length resyncs, does not throw") {
    val noLen = ("WARC/1.0\r\nWARC-Target-URI: doc://x\r\n\r\npayload\r\n\r\n").getBytes("UTF-8")
    val wrongLen = ("WARC/1.0\r\nWARC-Target-URI: doc://y\r\nContent-Length: 3\r\n\r\n" +
      "payloadlongerthan3\r\n\r\n").getBytes("UTF-8")
    val good = rec("doc://z", "ok")
    val rows = Warc.parseFile("h.warc", noLen ++ wrongLen ++ good)
    assert(rows.map(_.url) == Vector("doc://z"))
  }

  test("truncated tail and terminal magic do not hang or emit") {
    // ends mid-payload
    val r = rec("doc://1", "a long enough body here")
    assert(Warc.parseFile("t.warc", r.dropRight(10)).isEmpty)
    // ends exactly on a bare magic (the -1 sentinel case)
    val bytes = r ++ "WARC/".getBytes("US-ASCII")
    val rows = Warc.parseFile("t.warc", bytes)
    assert(rows.map(_.url) == Vector("doc://1"))
    // empty and magic-only inputs
    assert(Warc.parseFile("e.warc", Array.emptyByteArray).isEmpty)
    assert(Warc.parseFile("e.warc", "WARC/".getBytes("US-ASCII")).isEmpty)
  }

  test("read: binaryFile path over a dir of plain + gz files") {
    val dir = java.nio.file.Files.createTempDirectory("warcspec")
    try {
      val a = WarcGen.file(Seq(rec("doc://1", "alpha"), rec("doc://2", "beta")))
      val b = WarcGen.gzFile(Seq(rec("doc://3", "gamma")))
      java.nio.file.Files.write(dir.resolve("a.warc"), a)
      java.nio.file.Files.write(dir.resolve("b.warc.gz"), b)
      val df = Warc.read(spark, dir.toString)
      val got = df.selectExpr("warc_file", "url", "cast(payload as string) AS body", "offset")
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
      assert(got == Set(
        ("a.warc", "doc://1", "alpha", 0L),
        ("a.warc", "doc://2", "beta", (WarcGen.FixedOverhead + 7 + 1 + 5).toLong),
        ("b.warc.gz", "doc://3", "gamma", 0L)))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
