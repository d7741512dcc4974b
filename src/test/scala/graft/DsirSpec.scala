package graft

import org.apache.spark.sql.functions._
import graft.text.Dsir

/** DSIR importance resampling (driver gate: q_dsir). */
class DsirSpec extends SparkSuiteBase {
  import spark.implicits._

  private val B = 4096

  // target domain: "alpha beta" prose; raw corpus mixes it with "zeta eta"
  private val targetDocs = Seq(
    ("t1", "alpha beta alpha beta gamma"),
    ("t2", "alpha beta gamma alpha")).toDF("id", "text")
  private val rawDocs = Seq(
    ("t1", "alpha beta alpha beta gamma"),
    ("t2", "alpha beta gamma alpha"),
    ("r1", "zeta eta zeta eta theta"),
    ("r2", "zeta eta theta zeta"),
    ("r3", "alpha beta zeta eta")).toDF("id", "text")

  test("gramBuckets: unigrams + bigrams, bucketed and counted") {
    val g = Dsir.gramBuckets(Seq(("d", "a b c")).toDF("id", "text"),
      "id", "text", B).collect()
    // 3 unigrams + 2 bigrams
    assert(g.length == 5)
    assert(g.forall(r => r.getLong(1) >= 0 && r.getLong(1) < B))
    // single-token and empty docs degrade gracefully
    assert(Dsir.gramBuckets(Seq(("s", "solo"), ("e", "")).toDF("id", "text"),
      "id", "text", B).count() == 1) // "solo" unigram only
  }

  test("fit + score: target-like docs outscore off-target docs") {
    val model = Dsir.fit(targetDocs, rawDocs, "text", B)
    // model is bounded by the bucket space and covers every raw bucket
    assert(model.count() <= B)
    val scores = Dsir.score(rawDocs, "id", "text", model, B)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(scores("t1") > scores("r1"))
    assert(scores("t2") > scores("r2"))
    // the mixed doc sits between the pure ones
    assert(scores("r3") > scores("r1") && scores("r3") < scores("t1"))
  }

  test("resample: deterministic Gumbel top-k equals the explicit sort") {
    val model = Dsir.fit(targetDocs, rawDocs, "text", B)
    val scored = Dsir.score(rawDocs, "id", "text", model, B)
    val k = 3
    val picked = Dsir.resample(scored, k)
    assert(picked.count() == k)
    // re-run selects the identical set (hash-seeded noise, no RNG state)
    val again = Dsir.resample(scored, k).select("doc").collect().map(_.getString(0)).toSet
    assert(picked.select("doc").collect().map(_.getString(0)).toSet == again)
    // and it is exactly the top-k of the full keyed relation
    val full = Dsir.resample(scored, 1000)
      .orderBy(desc("key"), asc("doc")).collect().map(_.getString(0)).take(k).toSet
    assert(again == full)
  }
}
