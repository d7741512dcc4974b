package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Banned-phrase blocklist gate — the multi-phrase content filter of
  * published LLM data pipelines (Dolma / RefinedWeb / C4 §2.2 ban lists):
  * every document is annotated with how many blocklist phrases occur in it,
  * so the gate is a ledgered annotation (never a silent drop), exactly like
  * [[QualityFilter]].
  *
  * Reference behavior: the reference pipeline gates pages on per-pattern
  * regex scans (one pass per pattern). That shape is O(patterns × text) —
  * a 10k-phrase ban list re-reads every byte 10k times. Here the whole
  * list compiles into ONE Aho–Corasick automaton (Aho & Corasick, CACM
  * 1975 — published algorithm, from-scratch implementation) and every
  * document is scanned ONCE regardless of list size.
  *
  * Match semantics (frozen): a phrase matches on word boundaries, realized
  * by padding both the pattern and the text with single spaces
  * (`' '+p+' '` in `' '+text+' '`). ALL occurrences are counted, including
  * overlapping ones (`"a a"` occurs twice in `"a a a"`) — the automaton's
  * output links make overlap counting free, and the DuckDB oracle
  * replicates it with an exact positional scan.
  *
  * Plan shape: one narrow `mapPartitions` — the automaton is built once
  * per partition from the (small, driver-held) phrase array, then each
  * row is a single left-to-right scan. Zero shuffles, no UDF registry,
  * embarrassingly parallel at any corpus size; blocklist size only affects
  * the per-partition build, never the per-byte scan cost.
  */
object PhraseBlock {

  /** FROZEN driver-gate blocklist (sorted). Chosen to exercise the
    * automaton: nested extensions ("table hash" ⊂ "table hash value",
    * "merge order" ⊂ "merge order scan"), a self-overlapping phrase
    * ("a a"), a single word ("vector"), and a zero-hit phrase ("zz qq"). */
  val GateList: Seq[String] = Seq(
    "a a", "merge order", "merge order scan",
    "table hash", "table hash value", "vector", "zz qq")

  /** Classic goto/fail/output-link automaton over chars. Output sets are
    * flattened into per-node lists at build time (fine for gate-sized
    * lists; a million-phrase list would chain output links instead to keep
    * the trie linear in total pattern length). Built per-partition inside
    * the closure — nothing here needs to serialize. */
  final class Automaton(patterns: Array[String]) {
    import scala.collection.mutable
    private val children = mutable.ArrayBuffer(mutable.HashMap.empty[Char, Int])
    private val outBuf = mutable.ArrayBuffer(List.empty[Int])
    for (pi <- patterns.indices) {
      var v = 0
      for (c <- patterns(pi)) {
        v = children(v).getOrElseUpdate(c, {
          children += mutable.HashMap.empty[Char, Int]
          outBuf += Nil
          children.size - 1
        })
      }
      outBuf(v) = pi :: outBuf(v)
    }
    private val fail = new Array[Int](children.size)
    private val out: Array[List[Int]] = outBuf.toArray
    locally {
      val q = mutable.Queue.empty[Int]
      for ((_, u) <- children(0)) { fail(u) = 0; q.enqueue(u) }
      while (q.nonEmpty) {
        val v = q.dequeue()
        for ((c, u) <- children(v)) {
          var f = fail(v)
          while (f != 0 && !children(f).contains(c)) f = fail(f)
          val w = children(f).getOrElse(c, 0)
          fail(u) = if (w == u) 0 else w
          out(u) = out(u) ::: out(fail(u))
          q.enqueue(u)
        }
      }
    }

    /** Add every pattern occurrence in `text` into `counts` (by pattern
      * index). Overlaps included. */
    def countsInto(text: String, counts: Array[Int]): Unit = {
      var v = 0
      var i = 0
      while (i < text.length) {
        val c = text.charAt(i)
        while (v != 0 && !children(v).contains(c)) v = fail(v)
        v = children(v).getOrElse(c, 0)
        var os = out(v)
        while (os.nonEmpty) { counts(os.head) += 1; os = os.tail }
        i += 1
      }
    }
  }

  /** Per-document annotation: (doc_id, hits_total, phrases_matched,
    * blocked, top_phrase). `top_phrase` is the lexicographically smallest
    * matched phrase ('' when clean) — a deterministic "why blocked" sample.
    * Ids stay STRINGS like every sibling operator; null text scans as
    * empty (clean). */
  def annotate(spark: SparkSession, docs: DataFrame, idCol: String,
               textCol: String, phrases: Seq[String] = GateList): DataFrame = {
    import spark.implicits._
    val names = phrases.toArray
    val pats = names.map(p => " " + p + " ")
    docs.select(col(idCol).cast("string").as("id"),
        coalesce(col(textCol).cast("string"), lit("")).as("text"))
      .as[(String, String)]
      .mapPartitions { it =>
        val ac = new Automaton(pats)
        val counts = new Array[Int](pats.length)
        it.map { case (id, text) =>
          java.util.Arrays.fill(counts, 0)
          ac.countsInto(" " + text + " ", counts)
          var total = 0L
          var matched = 0L
          var top: String = null
          var i = 0
          while (i < counts.length) {
            if (counts(i) > 0) {
              total += counts(i)
              matched += 1
              if (top == null || names(i).compareTo(top) < 0) top = names(i)
            }
            i += 1
          }
          (id, total, matched, total > 0, if (top == null) "" else top)
        }
      }.toDF("doc_id", "hits_total", "phrases_matched", "blocked", "top_phrase")
  }
}
