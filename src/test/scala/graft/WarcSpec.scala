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

  private def key(r: Warc.WarcRow) =
    (r.warc_file, r.rec_idx, r.offset, r.url, r.warc_type, r.warc_date,
      r.content_length, new String(r.payload, "UTF-8"))

  test("parseStream == parseFile byte-for-byte at every tiny chunk size") {
    val recs = (0 until 6).map(i => rec(s"doc://$i", s"payload $i " * (i * 17 + 1)))
    val junk1 = "NOT A RECORD\r\n\r\n".getBytes("UTF-8")
    val junk2 = "WARC/1.0\r\nbroken header no blank line yet".getBytes("UTF-8")
    val wrongLen = ("WARC/1.0\r\nWARC-Target-URI: doc://y\r\nContent-Length: 3\r\n\r\n" +
      "payloadlongerthan3\r\n\r\n").getBytes("UTF-8")
    val cases = Seq(
      "plain" -> WarcGen.file(recs),
      "gz" -> WarcGen.gzFile(recs),
      "garbage" -> (junk1 ++ recs.head ++ junk2 ++ recs(1) ++ wrongLen ++ recs(2) ++ junk1),
      "trunc" -> (recs.head ++ recs(1).dropRight(9)),
      "empty" -> Array.emptyByteArray)
    for ((label, bytes) <- cases; chunk <- Seq(7, 64, 8192)) {
      val want = Warc.parseFile("s.warc", bytes).map(key)
      val got = Warc.parseStream("s.warc",
        new java.io.ByteArrayInputStream(bytes), chunkSize = chunk).toVector.map(key)
      assert(got == want, s"case $label chunk $chunk")
    }
  }

  test("parseStream rejects a zero chunk size instead of spinning") {
    val e = intercept[IllegalArgumentException](
      Warc.parseStream("z.warc", new java.io.ByteArrayInputStream(Array[Byte]()), 0))
    assert(e.getMessage.contains("chunkSize"))
  }

  test("parseStream replays the start+1 resync: embedded record inside a corrupt wrapper") {
    val inner = rec("doc://inner", "inner body text")
    val wrapper = (s"WARC/1.0\r\nWARC-Target-URI: doc://outer\r\nContent-Length: 7\r\n\r\n")
      .getBytes("UTF-8") ++ inner ++ "\r\n\r\n".getBytes("UTF-8")
    val want = Warc.parseFile("w.warc", wrapper)
    assert(want.map(_.url) == Vector("doc://inner")) // the wrapper fails its trailer check
    for (chunk <- Seq(5, 64, 1 << 20)) {
      val got = Warc.parseStream("w.warc",
        new java.io.ByteArrayInputStream(wrapper), chunkSize = chunk).toVector
      assert(got.map(key) == want.map(key), s"chunk $chunk")
    }
  }

  test("readStreaming: same rows as read over a dir, O(record) memory path") {
    val dir = java.nio.file.Files.createTempDirectory("warcstream")
    try {
      val a = WarcGen.file(Seq(rec("doc://1", "alpha"), rec("doc://2", "beta" * 2000)))
      val b = WarcGen.gzFile((0 until 5).map(i => rec(s"doc://g$i", s"gz body $i " * 50)))
      val junk = "junk ".getBytes("UTF-8") ++ WarcGen.file(Seq(rec("doc://j", "after junk")))
      java.nio.file.Files.write(dir.resolve("a.warc"), a)
      java.nio.file.Files.write(dir.resolve("b.warc.gz"), b)
      java.nio.file.Files.write(dir.resolve("c.warc"), junk)
      def collect(df: org.apache.spark.sql.DataFrame) = df
        .selectExpr("warc_file", "rec_idx", "offset", "url", "content_length",
          "cast(payload as string) AS body")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getString(3), r.getLong(4), r.getString(5))).toSet
      val got = collect(Warc.readStreaming(spark, dir.toString))
      val want = collect(Warc.read(spark, dir.toString))
      assert(got == want && want.size == 8)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
