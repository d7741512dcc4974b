package graft

import graft.dedup.Containment
import org.apache.spark.sql.Observation

/** Broder containment: hand-computed ratios, direction/tie semantics,
  * threshold edge, df-cap observability, partition invariance. */
class ContainmentSpec extends SparkSuiteBase {
  import spark.implicits._

  // 12 distinct tokens -> 8 5-gram shingles
  private val body = "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima"

  private def run(docs: Seq[(String, String)], tau: Double = 0.9,
                  maxDf: Int = 64, parts: Int = 4,
                  drops: Option[Observation] = None) =
    Containment.pairs(spark, docs.toDF("id", "text").repartition(parts),
        "id", "text", tau, maxDf, drops)
      .as[(String, String, Double)].collect().toSet

  test("full inclusion: C(A, A-plus-tail) = 1.0, directed at the smaller doc") {
    val container = body + " mike november oscar papa quebec romeo sierra tango"
    val got = run(Seq("a" -> body, "b" -> container))
    assert(got == Set(("a", "b", 1.0)))
  }

  test("hand-computed partial containment with the threshold edge") {
    // A has 8 shingles; B = A's first 11 tokens + a fresh tail keeps A's
    // first 7 shingles -> C(A,B) = 7/8 = 0.875
    val a = body
    val b = body.split(" ").take(11).mkString(" ") +
      " xray yankee zulu uniform victor whiskey"
    assert(run(Seq("a" -> a, "b" -> b), tau = 0.875) ==
      Set(("a", "b", 0.875)))
    assert(run(Seq("a" -> a, "b" -> b), tau = 0.876).isEmpty)
  }

  test("jaccard-invisible pair: tiny doc inside a huge container") {
    val huge = (0 until 400).map(i => s"w$i").mkString(" ") + " " + body
    val got = run(Seq("tiny" -> body, "huge" -> huge))
    assert(got == Set(("tiny", "huge", 1.0)))
    // sanity: resemblance would be ~8/401 — far below any near-dup bar
  }

  test("equal set sizes: the larger id is reported contained") {
    val got = run(Seq("a" -> body, "b" -> body))
    assert(got == Set(("b", "a", 1.0)))
  }

  test("df cap cuts corpus-hot shingles, observably") {
    // every doc shares `body`'s 8 shingles; each also has a unique tail
    // giving private shingles. With maxDf = 2 < 5 docs, the 8 shared
    // shingles are cut: no pair survives, drops are counted.
    val docs = (0 until 5).map { i =>
      (s"d$i", body + s" t${i}a t${i}b t${i}c t${i}d t${i}e t${i}f t${i}g")
    }
    val obs = Observation()
    val got = run(docs, tau = 0.5, maxDf = 2, drops = Some(obs))
    assert(got.isEmpty)
    // shared shingles: 8 pure-body + the 4 spanning body->tail are per-doc
    // unique (tail differs), so exactly 8 keys df=5 are dropped
    assert(obs.get("dropped_shingles") == 8L)
    assert(obs.get("dropped_rows") == 40L)
  }

  test("empty and sub-shingle docs never pair") {
    val got = run(Seq("e" -> "", "s" -> "two words", "a" -> body,
      "b" -> (body + " extra tokens here padding words")))
    assert(got == Set(("a", "b", 1.0)))
  }

  test("pure function of the corpus: partitioning does not matter") {
    val docs = Seq("a" -> body, "b" -> (body + " mike november oscar papa"),
      "c" -> body.split(" ").drop(2).mkString(" "))
    assert(run(docs, tau = 0.5, parts = 1) == run(docs, tau = 0.5, parts = 7))
  }
}
