package graft.extract

import graft.{ExtractedDoc, PageRow, Span}
import graft.extract.html.HtmlExtractor
import graft.extract.pdf.{PdfDoc, PdfText}
import org.apache.spark.sql.{Column, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import scala.util.control.NonFatal

/** Byte-stream sniffer (SURVEY.md §2.3 C1/C2): the web-domain analog of the
  * reference's needs-OCR decision (src/services/RAG/ocr_engine.py:269-280).
  * Cheap enough to run as a plain column expression so Catalyst can fold it.
  */
object Sniffer {
  /** Pure-Scala sniff over the leading bytes. */
  def sniff(bytes: Array[Byte]): String = {
    if (bytes == null || bytes.length < 4) return "unknown"
    if (bytes.length >= 5 &&
        bytes(0) == '%' && bytes(1) == 'P' && bytes(2) == 'D' && bytes(3) == 'F' && bytes(4) == '-')
      return "pdf"
    // HTML heuristic: a '<' appears in the first 256 bytes followed by an
    // ASCII letter, '!' or '/'
    val n = math.min(bytes.length, 256)
    var i = 0
    while (i < n - 1) {
      val c = bytes(i) & 0xff
      if (c == '<') {
        val d = bytes(i + 1) & 0xff
        if ((d >= 'a' && d <= 'z') || (d >= 'A' && d <= 'Z') || d == '!' || d == '/') return "html"
      }
      if (c == 0) return "unknown" // NUL in prefix: binary garbage
      i += 1
    }
    "unknown"
  }

  /** Column form: `kind` from the binary prefix, expressed with built-in
    * (codegen'd) functions only — substring/startswith over BINARY. */
  def kindCol(html: Column): Column =
    when(substring(html, 1, 5) === lit("%PDF-".getBytes), "pdf")
      .when(substring(html, 1, 1) === lit("<".getBytes) ||
            locate("<htm", lower(substring(html, 1, 256).cast("string"))) > 0 ||
            locate("<!do", lower(substring(html, 1, 256).cast("string"))) > 0 ||
            locate("<bod", lower(substring(html, 1, 256).cast("string"))) > 0 ||
            locate("<div", lower(substring(html, 1, 256).cast("string"))) > 0 ||
            locate("<p>",  lower(substring(html, 1, 256).cast("string"))) > 0, "html")
      .otherwise("unknown")
}

/** The extraction stage: one coarse typed `mapPartitions` over pages — the
  * idiomatic Spark port of the reference's per-file worker `process_one`
  * (src/services/RAG/convert_to_embeddings.py:341-430). Parser setup is
  * amortized per partition, errors become `err` rows (never task failures),
  * and a per-document byte cap plays the role of the reference's per-file
  * timeout (convert_to_embeddings.py:608-631, SURVEY.md §2.9 T3).
  */
object Extract {

  /** Documents larger than this bail out with err="oversize" (P5 skew cap). */
  val MaxDocBytes: Int = 64 << 20

  /** Per-document work budget (T3) — the reference's 1800 s per-file timeout
    * re-expressed as a DETERMINISTIC tick count (see [[TimeBudget]]): one
    * tick per PDF token/decode step, so 2^30 ticks is ~4 orders of magnitude
    * over a typical document and a few seconds of wall at nominal speed.
    * Any document past it is pathological (bomb/degenerate stream), not
    * slow — and the verdict is byte-identical on every rerun. */
  val PerDocBudgetTicks: Long = 1L << 30

  def extractOne(url: String, bytes: Array[Byte]): ExtractedDoc =
    extractOne(url, bytes, PerDocBudgetTicks)

  def extractOne(url: String, bytes: Array[Byte], budgetTicks: Long): ExtractedDoc = {
    if (bytes == null)
      return ExtractedDoc(url, "unknown", "", Nil, "err", 0, 0, "null_bytes")
    if (bytes.length > MaxDocBytes)
      return ExtractedDoc(url, Sniffer.sniff(bytes), "", Nil, "err", 0, 0, "oversize")
    TimeBudget.start(budgetTicks)
    try extractSniffed(url, bytes)
    finally TimeBudget.clear()
  }

  private def extractSniffed(url: String, bytes: Array[Byte]): ExtractedDoc = {
    Sniffer.sniff(bytes) match {
      case "pdf" =>
        try {
          val (text, pageSpans) = PdfText.extract(new PdfDoc(bytes))
          var eff = 0
          var ei = 0
          while (ei < text.length) { // manual loop: Char=>Boolean count boxes
            if (!Character.isWhitespace(text.charAt(ei))) eff += 1
            ei += 1
          }
          if (eff < 50) // empty-text gate, reference ocr_engine.py:229-235
            ExtractedDoc(url, "pdf", "", Nil, "empty_text", 0, 0, "")
          else
            ExtractedDoc(url, "pdf", text, pageSpans.map(p => Span(p._1, p._2, "page")),
              "text_layer", pageSpans.length, text.length, "")
        } catch {
          case _: TimeBudget.Exceeded =>
            ExtractedDoc(url, "pdf", "", Nil, "err", 0, 0, "work_budget")
          case NonFatal(e) =>
            ExtractedDoc(url, "pdf", "", Nil, "err", 0, 0,
              s"pdf_parse: ${Option(e.getMessage).getOrElse(e.getClass.getSimpleName).take(200)}")
        }
      case "html" =>
        try {
          val r = HtmlExtractor.extract(bytes)
          ExtractedDoc(url, "html", r.text, r.spans, r.method, r.nBlocks, r.text.length, "")
        } catch {
          case NonFatal(e) =>
            ExtractedDoc(url, "html", "", Nil, "err", 0, 0,
              s"html_parse: ${Option(e.getMessage).getOrElse(e.getClass.getSimpleName).take(200)}")
        }
      case _ =>
        ExtractedDoc(url, "unknown", "", Nil, "err", 0, 0, "unsniffable")
    }
  }

  /** Typed extraction over a pages Dataset.
    *
    * Column pruning is load-bearing at 100 TB (SURVEY.md §4): the stage
    * explicitly selects (url, html) BEFORE deserializing, so the parquet
    * scan's ReadSchema drops warc_ts/text/lang and the salting shuffle never
    * carries them. Verified via .explain("formatted"):
    * `ReadSchema: struct<url:string,html:binary>`. */
  def run(pages: Dataset[PageRow])(implicit spark: SparkSession): Dataset[ExtractedDoc] = {
    import spark.implicits._
    pages.select(col("url"), col("html")).as[(String, Array[Byte])]
      .mapPartitions(_.map { case (url, html) => extractOne(url, html) })
  }

  /** Prune + salt + extract in the right order: select only (url, html),
    * THEN repartition (the shuffle moves just those bytes), then parse. */
  def runSalted(pages: Dataset[PageRow], partitions: Int)
               (implicit spark: SparkSession): Dataset[ExtractedDoc] = {
    import spark.implicits._
    pages.select(col("url"), col("html")).as[(String, Array[Byte])]
      .repartition(partitions, col("url"))
      .mapPartitions(_.map { case (url, html) => extractOne(url, html) })
  }

  /** Salted repartition before extraction (north rule: defuse large-doc
    * skew): hash-partition directly on the high-cardinality url (NOT on a
    * precomputed `hash % n` column — repartition hashes its keys again, and
    * re-hashing n distinct values into n partitions leaves ~1/e of them
    * empty). Prefer [[runSalted]], which prunes columns before this
    * shuffle. */
  def salted(pages: Dataset[PageRow], partitions: Int): Dataset[PageRow] =
    pages.repartition(partitions, col("url"))
}
