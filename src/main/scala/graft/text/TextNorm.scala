package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic Unicode text canonicalization — the pre-dedup /
  * pre-tokenization cleanup step every web-scale training pipeline runs
  * before hashing (curly quotes, NBSP and em-dashes otherwise split
  * near-identical documents into distinct exact-dedup keys; the reference
  * normalizes extracted text before chunking,
  * src/services/RAG/recursive_chunker.py strip/whitespace handling).
  *
  * FROZEN contract, applied in this order:
  *   1. CRLF and bare CR fold to LF.
  *   2. 1:1 punctuation fold (code points, all BMP):
  *      U+2018/U+2019 -> ' ; U+201C/U+201D -> " ; U+00A0 -> space ;
  *      U+2013/U+2014/U+2212 -> - .
  *   3. U+2026 (horizontal ellipsis) -> "...".
  *   4. Control characters other than TAB/LF are stripped
  *      ([\x00-\x08\x0B\x0C\x0E-\x1F\x7F]).
  *   5. Runs of spaces/tabs collapse to one space.
  *   6. Spaces adjacent to a newline are dropped.
  *   7. Runs of 3+ newlines collapse to exactly two (paragraph break).
  *   8. Leading/trailing whitespace (space or newline) is trimmed.
  * After the chain the only whitespace left is single spaces, single
  * newlines and double-newline paragraph breaks.
  *
  * Everything is a built-in codegen'd expression chain (translate /
  * replace / regexp_replace) — no UDF, narrow per-row map, zero shuffles:
  * at 100 TB this runs at scan speed inside WholeStageCodegen. The exact
  * same chain is replicated in DuckDB SQL by [[oracleExpr]] (RE2 vs Java
  * regex parity: no \s, no \d — only explicit classes both engines read
  * identically; unanchored replaces carry DuckDB's 'g' flag, anchored ones
  * match at most once so the first-match default is identical).
  */
object TextNorm {

  /** 1:1 fold map (step 2) — kept as paired strings so the Column and the
    * reference-string implementations can't drift. */
  val FoldFrom = "‘’“” –—−"
  val FoldTo = "''\"\" ---"

  private val CtrlClass = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"

  /** Driver-gate harness suffix: exercises EVERY branch of the contract
    * (CRLF + bare CR, stripped controls, each fold char, ellipsis, tab and
    * space runs, newline-adjacent spaces, a 4-newline paragraph collapse,
    * and trailing-edge trim) so q_normalize is never an identity pass over
    * plain corpus text. Shared by the query, the oracle and the spec. */
  val Inject: String =
    " \tStart\r\nA" + 1.toChar + "B" + 7.toChar +
      " ‘q’ “w” – — − x…" + 160.toChar +
      "y  z\t\t w \r \n\n\n\n" + 127.toChar + "END \n "

  /** The normalization chain as a Column (codegen'd, no UDF). */
  def normalizeCol(text: Column): Column = {
    val lf = replace(replace(text, lit("\r\n"), lit("\n")), lit("\r"), lit("\n"))
    val folded = replace(translate(lf, FoldFrom, FoldTo), lit("…"), lit("..."))
    val ctrl = regexp_replace(folded, CtrlClass, "")
    val spaces = regexp_replace(ctrl, "[ \\t]+", " ")
    val nlTight = regexp_replace(spaces, "[ ]*\\n[ ]*", "\n")
    val para = regexp_replace(nlTight, "\\n{3,}", "\n\n")
    regexp_replace(regexp_replace(para, "^[ \\n]+", ""), "[ \\n]+$", "")
  }

  /** Reference JVM-string implementation of the same frozen contract —
    * used by the spec to property-check the Column chain. */
  def normalize(s: String): String = {
    val lf = s.replace("\r\n", "\n").replace("\r", "\n")
    val folded = lf.map { c =>
      val i = FoldFrom.indexOf(c.toInt)
      if (i >= 0) FoldTo.charAt(i) else c
    }.mkString.replace("…", "...")
    folded.replaceAll(CtrlClass, "")
      .replaceAll("[ \\t]+", " ")
      .replaceAll("[ ]*\\n[ ]*", "\n")
      .replaceAll("\\n{3,}", "\n\n")
      .replaceAll("^[ \\n]+", "").replaceAll("[ \\n]+$", "")
  }

  /** DuckDB SQL replica of [[normalizeCol]] over SQL expression `e`. */
  def oracleExpr(e: String): String = {
    val from = FoldFrom.map(c => s"chr(${c.toInt})").mkString("||")
    val to = sqlLit(FoldTo)
    val lf = s"replace(replace($e, chr(13)||chr(10), chr(10)), chr(13), chr(10))"
    val folded = s"replace(translate($lf, $from, $to), chr(8230), '...')"
    val ctrl = s"regexp_replace($folded, '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g')"
    val spaces = s"regexp_replace($ctrl, '[ \\t]+', ' ', 'g')"
    val nlTight = s"regexp_replace($spaces, '[ ]*\\n[ ]*', chr(10), 'g')"
    val para = s"regexp_replace($nlTight, '\\n{3,}', chr(10)||chr(10), 'g')"
    s"regexp_replace(regexp_replace($para, '^[ \\n]+', ''), '[ \\n]+$$', '')"
  }

  /** Render an arbitrary Scala string as a DuckDB expression: printable
    * ASCII runs as quoted literals, everything else as chr(n) — so a test
    * string authored once in Scala reaches the oracle byte-identically
    * with no encoding/escaping trapdoors in oracle_sql.json. */
  def sqlLit(s: String): String = {
    if (s.isEmpty) return "''"
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val run = new StringBuilder
    def flush(): Unit = if (run.nonEmpty) {
      parts += "'" + run.toString.replace("'", "''") + "'"; run.clear()
    }
    s.foreach { c =>
      if (c >= ' ' && c.toInt < 0x7f) run.append(c)
      else { flush(); parts += s"chr(${c.toInt})" }
    }
    flush()
    parts.mkString("||")
  }
}
