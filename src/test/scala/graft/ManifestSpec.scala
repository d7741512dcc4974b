package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.lake.LakeTable

/** Manifest codec roundtrip under hostile strings — the hand-rolled JSON
  * writer/parser must survive quotes, backslashes, control chars and
  * unicode in file paths, keys, and lineage values. */
class ManifestSpec extends AnyFunSuite {

  test("manifest roundtrips nasty strings byte-exactly") {
    val root = Files.createTempDirectory("graft-manifest").toString
    val lake = new LakeTable(root)
    val nastyFile = s"""$root/we"ird\\path\nwith\tctrl.parquet"""
    val lineage = Seq(
      Map("bucket" -> "0", "url_lo" -> "https://a.example/x?q=\"1\"&b=\\2",
        "note" -> "line1\nline2\ttabbed", "uni" -> "emoji é中"),
      Map("bucket" -> "1", "url_lo" -> "https://b.example/a}b{c]d[e", "note" -> "v}]"),
      Map("bucket" -> "2", "url_lo" -> "plain"))
    // ']' in a path and '}'/'{'/'[' in lineage values are the parser's field
    // terminators — the codec must escape them or committed data goes invisible
    val bracketFile = s"$root/part-[0]{x}.parquet"
    val metrics = Map("docs" -> 12.0, "neg" -> -3.5, "sci" -> 1.25e-7)
    val v = lake.commit(Seq(nastyFile, bracketFile, "normal.parquet"),
      Seq("k\"1", "k\\2", "k]3", "k}4"), lineage, metrics)
    assert(v == 1)

    val m = new LakeTable(root).readManifest(1)
    assert(m.files == Seq(nastyFile, bracketFile, "normal.parquet"))
    assert(m.keys == Seq("k\"1", "k\\2", "k]3", "k}4"))
    assert(m.lineage == lineage)
    assert(m.metrics == metrics)
  }

  test("concurrent commit at the same version fails loudly, not silently") {
    val root = Files.createTempDirectory("graft-race").toString
    val lake = new LakeTable(root)
    lake.commit(Nil, Seq("0"), Nil, Map.empty) // v1
    // simulate a racing writer that already wrote the v2 manifest but has
    // not yet swung the hint: our commit must NOT clobber it
    Files.createDirectories(java.nio.file.Paths.get(root, "metadata"))
    Files.write(java.nio.file.Paths.get(root, "metadata", "v2.json"),
      "{}".getBytes("UTF-8"))
    intercept[java.nio.file.FileAlreadyExistsException] {
      lake.commit(Nil, Seq("1"), Nil, Map.empty) // computes v2 -> collision
    }
  }
}
