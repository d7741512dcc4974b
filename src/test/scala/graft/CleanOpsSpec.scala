package graft

import org.apache.spark.sql.functions._
import graft.text.{Decontam, Pii}

/** Decontamination + PII redaction — the corpus-cleaning operators added in
  * round 5 (driver gates: q_decontam, q_pii). */
class CleanOpsSpec extends SparkSuiteBase {
  import spark.implicits._

  // --- Decontam -----------------------------------------------------------

  private val benchText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"

  test("decontam: exact copy fully contaminated, disjoint doc clean") {
    val docs = Seq(
      ("copy", benchText),                                   // every gram shared
      ("clean", "one two three four five six seven eight nine ten"),
      ("empty", ""),
      ("short", "alpha beta")                                // < n tokens → whole-string gram
    ).toDF("id", "text")
    val bench = Seq(benchText).toDF("text")
    val out = Decontam.flag(docs, "id", "text", bench, "text", n = 5)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap

    assert(out("copy") == ((6L, 6L, true)))   // 10 tokens → 6 distinct 5-grams, all hit
    assert(out("clean") == ((6L, 0L, false)))
    assert(out("empty") == ((0L, 0L, false)))
    // "alpha beta" whole-string gram != any bench 5-gram
    assert(out("short") == ((1L, 0L, false)))
  }

  test("decontam: partial overlap counts only the shared grams") {
    // doc shares exactly the first 6 tokens with the bench text → 5-grams
    // over tokens 1..6 of the doc that also appear in bench = 2
    val docs = Seq(
      ("partial", "alpha beta gamma delta epsilon zeta BANANA orange mango lime")
    ).toDF("id", "text")
    val bench = Seq(benchText).toDF("text")
    val row = Decontam.flag(docs, "id", "text", bench, "text", n = 5)
      .collect().head
    assert(row.getLong(1) == 6L)   // 10 tokens → 6 grams
    assert(row.getLong(2) == 2L)   // [alpha..epsilon], [beta..zeta]
    assert(row.getBoolean(3))
    // note: "BANANA" lowercases into the shared word model — gram 3 is
    // "gamma delta epsilon zeta banana", not in bench
  }

  test("decontam: repeated gram in a doc counts once (distinct grams)") {
    val docs = Seq(("rep", s"$benchText $benchText")).toDF("id", "text")
    val bench = Seq(benchText).toDF("text")
    val row = Decontam.flag(docs, "id", "text", bench, "text", n = 5)
      .collect().head
    // 20 tokens → 16 windows, but the bench grams all repeat: distinct set
    // = 6 in-bench + 4 bridging grams (eta..alpha through kappa..delta)
    assert(row.getLong(1) == 10L)
    assert(row.getLong(2) == 6L)
  }

  test("decontam: bench side joins as a broadcast, corpus side one exchange") {
    val docs = spark.range(100)
      .select(col("id").cast("string").as("id"),
        concat(lit("w"), col("id"), lit(" x y z q r s t u v")).as("text"))
    val bench = Seq(benchText).toDF("text")
    val plan = Decontam.flag(docs, "id", "text", bench, "text", n = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"bench set should broadcast:\n$plan")
  }

  // --- Pii ----------------------------------------------------------------

  private def pii1(text: String): (Long, Long, Long, String) = {
    val r = Pii.annotate(Seq(text).toDF("text"), "text")
      .select("n_emails", "n_phones", "n_ips", "clean_text").collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
  }

  test("pii: counts and redaction for each kind") {
    assert(pii1("mail me at jo.doe+x@sub.example.co today") ==
      ((1L, 0L, 0L, "mail me at |||EMAIL_ADDRESS||| today")))
    assert(pii1("call 555-013-4599 or 555-013-4600") ==
      ((0L, 2L, 0L, "call |||PHONE_NUMBER||| or |||PHONE_NUMBER|||")))
    assert(pii1("host 192.168.0.1 down") ==
      ((0L, 0L, 1L, "host |||IP_ADDRESS||| down")))
    assert(pii1("no pii here") == ((0L, 0L, 0L, "no pii here")))
  }

  test("pii: ip-shaped mail host is consumed by the email redaction") {
    val (e, p, i, t) = pii1("ping root@10.0.0.1 now")
    // the email pattern requires an alpha TLD, so root@10.0.0.1 is NOT an
    // email — the dotted quad must survive as a bare IP hit
    assert((e, p, i) == ((0L, 0L, 1L)))
    assert(t == "ping root@|||IP_ADDRESS||| now")
    // but with an alpha TLD the whole address redacts as one email
    assert(pii1("ping root@mail7.example.org now") ==
      ((1L, 0L, 0L, "ping |||EMAIL_ADDRESS||| now")))
  }

  test("pii: counts are taken on the original text, not the redacted one") {
    val (e, p, i, t) = pii1("a@b.co 111-222-3333 1.2.3.4")
    assert((e, p, i) == ((1L, 1L, 1L)))
    assert(t == "|||EMAIL_ADDRESS||| |||PHONE_NUMBER||| |||IP_ADDRESS|||")
  }

  // --- C4Clean ------------------------------------------------------------

  private def c4(rows: Seq[(String, String)]): Map[String, (Boolean, Int, Int, String)] = {
    graft.text.C4Clean.clean(spark, rows.toDF("id", "text"), "id", "text")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getBoolean(1), r.getInt(2), r.getInt(3), r.getString(4)))).toMap
  }

  private val threeKeepers =
    "this line has five words.\nand this one also qualifies!\nthird fine sentence right here?"

  test("c4: clean page with three terminal-punctuated 5-word lines is kept") {
    val out = c4(Seq(("keep", threeKeepers)))
    assert(out("keep") == ((true, 3, 0, threeKeepers)))
  }

  test("c4: short, unterminated and javascript lines drop; page survives") {
    val out = c4(Seq(
      ("short", s"one two.\n$threeKeepers"),
      ("nopunct", s"this line has no terminal punctuation\n$threeKeepers"),
      ("js", s"please enable javascript to continue here.\n$threeKeepers")))
    // each poison line drops at LINE level; 3 keepers remain → page kept
    assert(out("short") == ((true, 3, 1, threeKeepers)))
    assert(out("nopunct") == ((true, 3, 1, threeKeepers)))
    assert(out("js") == ((true, 3, 1, threeKeepers)))
  }

  test("c4: lorem ipsum and curly-brace pages drop whole-page") {
    val out = c4(Seq(
      ("lorem", s"$threeKeepers\nlorem ipsum dolor"),
      ("brace", s"$threeKeepers\nif (x) { y }")))
    // the poison lines also fail line rules (no terminal punct) → dropped,
    // but the PAGE verdict comes from the raw-page token
    assert(out("lorem") == ((false, 3, 1, threeKeepers)))
    assert(out("brace") == ((false, 3, 1, threeKeepers)))
  }

  test("c4: pages with fewer than three kept lines drop; empty text safe") {
    val out = c4(Seq(
      ("toofew", "this line has five words.\nand this one also qualifies!"),
      ("empty", ""),
      ("blank", "\n\n  \n")))
    assert(out("toofew") == ((false, 2, 0,
      "this line has five words.\nand this one also qualifies!")))
    assert(out("empty") == ((false, 0, 0, "")))
    // blank lines are structure, not content: not counted as dropped
    assert(out("blank") == ((false, 0, 0, "")))
  }

  test("c4: closing double-quote is a terminal mark (C4's dialogue rule)") {
    val q = "he said \"this is five words.\""
    val out = c4(Seq(("quote", s"$q\nand this one also qualifies!\nthird fine sentence right here?")))
    assert(out("quote")._1 && out("quote")._2 == 3)
    assert(out("quote")._4.startsWith(q))
  }
}
