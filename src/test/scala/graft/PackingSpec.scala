package graft

import graft.text.Packing

/** Concat-and-split sequence packing: the distributed two-pass prefix sum
  * must equal the closed-form global prefix, for any partition count. */
class PackingSpec extends SparkSuiteBase {
  import spark.implicits._

  test("exact offsets on a hand-computed corpus; straddling documents allowed") {
    val docs = Seq(("a", 300L), ("b", 300L), ("c", 100L), ("d", 500L))
      .toDF("id", "tokens")
    val out = Packing.packSequences(docs, "id", "tokens", seqLen = 512L)
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // prefixes: a=0, b=300, c=600, d=700
    assert(out == Seq(
      ("a", 300L, 0L, 0L),
      ("b", 300L, 0L, 300L), // straddles the 512 boundary
      ("c", 100L, 1L, 88L),
      ("d", 500L, 1L, 188L)))
  }

  test("partition-count invariance: 1, 2 and 7 partitions give identical packing") {
    val docs = (0 until 200)
      .map(i => (f"d$i%03d", 1L + (Hashing.mix64(i.toLong) & 0xffL)))
      .toDF("id", "tokens")
    def run(p: Int) = Packing.packSequences(docs, "id", "tokens", 257L, partitions = p)
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val base = run(1)
    assert(base.nonEmpty && run(2) == base && run(7) == base)
  }
}
