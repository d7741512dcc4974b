package graft

import org.apache.spark.sql.functions._
import graft.index.Bm25
import graft.jobs.IndexJob

/** Proximity window counts: hand-checked interval arithmetic, edge
  * anchors, repeated terms, brute-force equality, and the index-resident
  * form matching the corpus-side one. */
class ProximitySpec extends SparkSuiteBase {
  import spark.implicits._

  private def prox(docs: Seq[(String, String)], q: String, w: Int) =
    Bm25.proximityWindows(docs.toDF("id", "text"), "id", "text", q, w)
      .as[(String, Long)].collect().toMap

  test("hand-checked: adjacent terms vs far-apart terms") {
    val docs = Seq(
      "near" -> "spark join now and other words trail here",  // pos 0,1
      "far" -> ("spark " + ("x " * 10) + "join"),             // pos 0, 11
      "none" -> "spark only no second term")
    // w=3: anchors covered by spark@0: {0}; wait — max(0-2,0)..0 = {0};
    // join@1 covers {0,1} (clamped). Both cover 0 -> 1 window.
    assert(prox(docs, "spark join", 3) == Map("near" -> 1L))
    // w=12: near gets anchors {0} ∩ spark... spark@0 covers {0}; join@1
    // covers {0,1}: 1 window. far: spark@0 covers {0}; join@11 covers
    // {0..11}: window at 0 -> both docs score 1
    assert(prox(docs, "spark join", 12) == Map("near" -> 1L, "far" -> 1L))
  }

  test("matches a brute-force window scan") {
    val docs = (0 until 25).map { i =>
      val words = (0 until 30).map(k => Seq("a", "b", "c", "x")(((i * 5 + k * k + k / 3) % 7) % 4))
      (f"d$i%02d", words.mkString(" "))
    }
    for (w <- Seq(2, 4, 9); q <- Seq("a b", "a b c")) {
      val terms = q.split(" ").toSet
      val want = docs.flatMap { case (id, text) =>
        val toks = text.split(" ")
        val n = (0 until toks.length).count { a =>
          terms.forall(t => (a until math.min(a + w, toks.length)).exists(p => toks(p) == t))
        }
        if (n > 0) Some(id -> n.toLong) else None
      }.toMap
      assert(prox(docs, q, w) == want, s"w=$w q=$q")
    }
  }

  test("index-resident form equals the corpus-side one (tombstones honored)") {
    val root = java.nio.file.Files.createTempDirectory("graft-prox").toString
    val docs = (0 until 40).map(i => (i.toString,
      if (i % 3 == 0) "alpha beta near here now" else "alpha far words beta"))
    IndexJob.build(spark,
      docs.toDF("id", "text").withColumn("is_duplicate", lit(false)),
      root, positions = true)
    IndexJob.tombstone(spark, root, Seq("0", "3").toDF("doc"))
    val live = docs.filterNot(d => d._1 == "0" || d._1 == "3")
    val want = prox(live, "alpha beta", 3)
    val got = IndexJob.proximitySearch(spark, root, "alpha beta", 3)
      .as[(String, Long)].collect().toMap
    assert(got == want)
    assert(!got.contains("0") && got.nonEmpty)
  }
}
