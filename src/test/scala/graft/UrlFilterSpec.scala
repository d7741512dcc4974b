package graft

import org.apache.spark.sql.execution.ExplainMode
import graft.text.UrlFilter

/** RefinedWeb-style URL pre-filter (driver gate: q_url_filter). */
class UrlFilterSpec extends SparkSuiteBase {
  import spark.implicits._

  private val blocklist = Seq("bad.example", "worse.example").toDF("domain")

  test("url filter: registrable domain — www strip, deep subdomains, bare host") {
    val urls = Seq(
      ("a", "https://www.bad.example/x"),
      ("b", "https://cdn.assets.good.example/y"),
      ("c", "http://plain.example"),
      ("d", "https://www.only"))
    val got = UrlFilter.annotate(urls.toDF("id", "url"), "url", blocklist)
      .select("id", "reg_domain").as[(String, String)].collect().toMap
    assert(got == Map("a" -> "bad.example", "b" -> "good.example",
      "c" -> "plain.example", "d" -> ""))
  }

  test("url filter: blocked domains drop regardless of penalty; penalty counts distinct words") {
    val urls = Seq(
      ("block", "https://bad.example/perfectly/clean/path"),
      ("soft1", "https://ok.example/casino"),                 // 1 word < 2 → kept
      ("soft2", "https://ok.example/casino-torrent"),         // 2 words → dropped
      ("multi", "https://ok.example/spam/spam/spam"),         // same word once
      ("clean", "https://ok.example/fine"))
    val got = UrlFilter.annotate(urls.toDF("id", "url"), "url", blocklist)
      .select("id", "blocked", "url_penalty", "url_keep")
      .as[(String, Boolean, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("block") == ((true, 0L, false)))
    assert(got("soft1") == ((false, 1L, true)))
    assert(got("soft2") == ((false, 2L, false)))
    assert(got("multi") == ((false, 1L, true)))
    assert(got("clean") == ((false, 0L, true)))
    val kept = UrlFilter.keep(urls.toDF("id", "url"), "url", blocklist)
      .select("id").as[String].collect().toSet
    assert(kept == Set("soft1", "multi", "clean"))
  }

  test("url filter: blocklist join is broadcast — the corpus never shuffles") {
    val docs = (0 until 200).map(i => (s"d$i", s"https://host$i.example/p")).toDF("id", "url")
    val plan = UrlFilter.annotate(docs, "url", blocklist)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("BroadcastHashJoin"), s"blocklist join not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus shuffled for the blocklist:\n$plan")
    assert(!plan.contains("ScalaUDF"), s"ScalaUDF leaked into the plan:\n$plan")
  }
}
