package graft

import graft.index.TermDict

/** Front-coded term dictionary: brute-force equality, partition-count
  * invariance, block seek points, byte accounting. */
class TermDictSpec extends SparkSuiteBase {
  import spark.implicits._

  private val docs = Seq(
    "interface interfaces interfaced interior internal inter",
    "scan scans scanner scanned filter filters filtering",
    "a ab abc abcd zebra zoo").map(Tuple1(_))

  private def brute(blockSize: Int): Seq[(String, Long, Long, Long, String, Long, Long)] = {
    val vocab = docs.flatMap(_._1.split(" ")).distinct.sorted
    vocab.zipWithIndex.map { case (t, r) =>
      val pos = r % blockSize
      val prev = if (pos == 0 || r == 0) None else Some(vocab(r - 1))
      val lcp = prev.fold(0)(p => t.zip(p).takeWhile { case (x, y) => x == y }.size)
      val suffix = t.substring(lcp)
      val nb = 2L + suffix.length // lcp and |suffix| both < 128 here
      val bs = lcp.toLong + suffix.length + suffix.map(_.toLong).sum
      (t, (r / blockSize).toLong, pos.toLong, lcp.toLong, suffix, nb, bs)
    }
  }

  private def got(blockSize: Int, partitions: Int) =
    TermDict.frontCoded(docs.toDF("text"), "text", blockSize, partitions)
      .as[(String, Long, Long, Long, String, Long, Long)]
      .collect().sortBy(_._1).toSeq

  test("matches the brute-force front coding, including byte accounting") {
    assert(got(4, 3) == brute(4).sortBy(_._1))
  }

  test("identical for any partition count (two-pass global rank)") {
    val want = brute(16).sortBy(_._1)
    for (p <- Seq(1, 2, 7)) assert(got(16, p) == want, s"partitions $p")
  }

  test("block heads store the whole term") {
    got(4, 2).filter(_._3 == 0L).foreach { r =>
      assert(r._4 == 0L && r._5 == r._1, r)
    }
  }

  test("shared prefixes actually compress (suffix bytes < term bytes)") {
    val rows = got(16, 2)
    val full = rows.map(_._1.length.toLong).sum
    val coded = rows.map(_._6).sum
    assert(coded < full, s"coded $coded vs raw $full")
  }
}
