package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for training-data pipelines: language-ID,
  * quality scoring, token counting, fingerprinting. All built-in
  * (codegen'd) expressions — no UDFs in the hot path.
  *
  * The language heuristic generalizes the reference's
  * "≥3 of 8 common English words present → english"
  * (src/services/RAG/metadata_extractor.py:211-213) to five languages with
  * the same common-word-count trick.
  */
object TextAnalysis {

  /** Common-word marker sets (public stopword lists, truncated to 8). */
  val Markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "las", "por"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "fr" -> Seq("le", "la", "les", "des", "est", "une", "dans", "pour"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有", "我"))

  private def markerHits(text: Column, words: Seq[String]): Column =
    words.map(w => when(text.rlike("(?i)(^|[^a-z0-9])" + java.util.regex.Pattern.quote(w) + "($|[^a-z0-9])"), 1).otherwise(0))
      .reduce(_ + _)

  /** Reference C5 semantics, english-only: >= 3 marker hits → "english". */
  def englishIdCol(text: Column): Column =
    when(markerHits(text, Markers("en")) >= 3, lit("english")).otherwise(lit("unknown"))

  /** Multi-language n-gram/common-word heuristic: argmax of marker hits.
    * Deterministic tie-break by language code order. */
  def langIdCol(text: Column): Column = {
    val scored = Markers.toSeq.sortBy(_._1).map { case (lang, ws) =>
      struct(markerHits(text, ws).as("hits"), lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best.getField("hits") >= 2, best.getField("lang")).otherwise(lit("und"))
  }

  /** Whitespace token count (BIGINT). */
  def wsTokenCountCol(text: Column): Column =
    size(filter(split(text, "\\s+"), t => length(t) > 0)).cast("long")

  /** BPE-ish subword-unit count: alphanumeric runs + individual punctuation
    * marks, the shape a byte-pair tokenizer's pre-tokenizer produces. */
  def bpeishTokenCountCol(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long")

  /** ~4 chars/token estimator, the reference's fallback
    * (src/services/RAG/convert_to_embeddings.py:106-118: max(1, len//4)). */
  def approxTokenCountCol(text: Column): Column =
    greatest(lit(1L), (length(text) / 4).cast("long"))

  /** Quality score 0..100 from length, punctuation ratio, stopword ratio —
    * the web-text analog of the reference's completeness/readability scores
    * (src/services/RAG/metadata_extractor.py:214-268). Weights frozen. */
  def qualityScoreCol(text: Column): Column = {
    val len = length(text).cast("double")
    val lenScore = least(lit(40.0), len / 50.0) // 2000+ chars → full 40
    val words = wsTokenCountCol(text).cast("double")
    val stop = markerHits(text, Markers("en")).cast("double")
    val stopScore = least(lit(30.0), stop * 5.0) // >=6 distinct markers → full 30
    val punct = size(regexp_extract_all(text, lit("[.,;:!?]"), lit(0))).cast("double")
    val punctRatio = punct / greatest(words, lit(1.0))
    val punctScore = lit(30.0) * greatest(lit(0.0), lit(1.0) - abs(punctRatio - lit(0.1)) * lit(5.0))
    round(least(lit(100.0), lenScore + stopScore + punctScore), 2)
  }

  /** Readability proxy, exactly the reference formula
    * (src/services/RAG/metadata_extractor.py:214-222):
    * 100 - (avg_sentence_len_words*0.5 + avg_word_len_chars*2), clamped. */
  def readabilityCol(text: Column): Column = {
    val words = wsTokenCountCol(text).cast("double")
    val sentences = greatest(size(filter(split(text, "[.!?]+"), s => length(trim(s)) > 0)).cast("double"), lit(1.0))
    val wordChars = length(regexp_replace(text, "\\s+", "")).cast("double")
    val avgSentLen = words / sentences
    val avgWordLen = wordChars / greatest(words, lit(1.0))
    round(greatest(lit(0.0), least(lit(100.0), lit(100.0) - (avgSentLen * 0.5 + avgWordLen * 2.0))), 2)
  }

  /** Character-bigram Shannon entropy (nats) — the classic gibberish /
    * machine-generated-text detector (low entropy → repetitive spam, very
    * high → random noise; used as a quality feature since at least
    * Gopher/MassiveText-era pipelines). Computed SHUFFLE-FREE per row with
    * higher-order array functions — no groupBy, no UDF: bigram list →
    * array_sort → run-length boundaries → counts, then
    * H = ln(n) − Σ c·ln(c) / n. The ONLY rounding is the single 4-dp
    * quantization at the output (the round-5 quantize-once discipline);
    * intermediate sums stay raw doubles, so cross-engine libm/order
    * differences sit ~9 orders of magnitude under the output quantum.
    * Texts with fewer than 2 chars define H = 0. */
  def charBigramEntropyCol(textIn: Column): Column = {
    val text = coalesce(textIn, lit(""))
    val n = (length(text) - 1).cast("long")
    val grams = transform(sequence(lit(1L), n), i => text.substr(i, lit(2)))
    val sorted = array_sort(grams)
    // boundary positions: 1-based indices where a new run starts
    val bounds = filter(sequence(lit(1L), n),
      i => (i === 1L) || element_at(sorted, i.cast("int")) =!=
        element_at(sorted, (i - 1L).cast("int")))
    // run lengths: next boundary (sentinel n+1) minus this boundary
    val shifted = concat(slice(bounds, lit(2), size(bounds)), array(n + 1L))
    val counts = zip_with(bounds, shifted, (a, b) => b - a)
    val sumClnC = aggregate(counts, lit(0.0),
      (acc, c) => acc + c.cast("double") * log(c.cast("double")))
    // abs: a one-run text computes ln(n) − (n·ln n)/n = ±1-ulp noise which
    // rounds to −0.0 half the time; −0 vs +0 formats differently across
    // engines. True negatives are impossible (H ≥ 0), so abs is exact.
    when(n >= 1L,
        abs(round(log(n.cast("double")) - sumClnC / n.cast("double"), 4)))
      .otherwise(lit(0.0))
  }

  /** Content fingerprint: md5 of whitespace-normalized lowercase text —
    * the SQL-expressible exact-dedup key. */
  def fingerprintCol(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")).cast("binary"))

  /** Url-derived facets — the web-domain analog of the reference's
    * path-derived metadata (src/utils/path_meta.py:18-56: DEPARTMENT/
    * LEVEL/.../FILENAME parsed from directory structure): host, top path
    * segment, leaf segment, path depth, all from one regex family so the
    * same facets are derivable in any SQL engine. */
  def urlHostCol(url: Column): Column =
    regexp_extract(url, "^[a-z]+://([^/]+)", 1)

  def urlTopDirCol(url: Column): Column =
    regexp_extract(url, "^[a-z]+://[^/]+/([^/]+)", 1)

  def urlLeafCol(url: Column): Column =
    regexp_extract(url, "/([^/]+)$", 1)

  def urlDepthCol(url: Column): Column =
    (size(filter(split(regexp_replace(url, "^[a-z]+://[^/]*", ""), "/"),
      s => length(s) > 0))).cast("long")

  /** Winnowing document fingerprint (Schleimer et al., SIGMOD'03): k-gram
    * hashes, min per window — robust to local edits. K-grams hash with
    * md5-top-64 masked to 63 bits (like the MinHash/SimHash features) so
    * signed Long comparison == unsigned and the DuckDB oracle reproduces
    * the fingerprints exactly. */
  def winnow(text: String, k: Int = 8, window: Int = 4): Vector[Long] = {
    val s = text.toLowerCase.replaceAll("\\s+", " ").trim
    if (s.length < k) return if (s.isEmpty) Vector.empty
      else Vector(graft.Hashing.md5Long(s) & Long.MaxValue)
    val hashes = new Array[Long](s.length - k + 1)
    var i = 0
    while (i <= s.length - k) {
      hashes(i) = graft.Hashing.md5Long(s.substring(i, i + k)) & Long.MaxValue; i += 1
    }
    val out = Vector.newBuilder[Long]
    var last = Long.MinValue
    var w = 0
    while (w <= hashes.length - window) {
      var m = hashes(w); var j = 1
      while (j < window) { if (hashes(w + j) < m) m = hashes(w + j); j += 1 }
      if (m != last || w == 0) { out += m; last = m }
      w += 1
    }
    out.result().distinct
  }

  /** Repetition ratios — the Gopher/MassiveText quality-filter family
    * (published in "Scaling Language Models: Methods, Analysis & Insights
    * from Training Gopher", Rae et al. 2021, Table A1): documents dominated
    * by repeated lines, repeated n-grams, or a single token are
    * low-quality boilerplate/spam. Returns
    * (dup_line_frac, dup_5gram_frac, top_word_frac), each in [0, 1]:
    *   dup_line_frac  = 1 − distinct/total over trimmed non-empty lines
    *   dup_5gram_frac = 1 − distinct/total over word 5-grams
    *                    (tokenizer shared with MinHash — same word model)
    *   top_word_frac  = most frequent token count / total tokens
    * Empty denominators yield 0.0. */
  def repetitionRatios(text: String): (Double, Double, Double) = {
    val lines = text.split("\n").map(_.trim).filter(_.nonEmpty)
    val dupLine =
      if (lines.isEmpty) 0.0
      else 1.0 - lines.distinct.length.toDouble / lines.length
    val toks = graft.dedup.MinHash.tokenize(text)
    val n5 = toks.length - 4
    val dup5 =
      if (n5 <= 0) 0.0
      else {
        val grams = new Array[String](n5)
        var i = 0
        while (i < n5) {
          val sb = new StringBuilder
          var k = 0
          while (k < 5) { if (k > 0) sb.append(' '); sb.append(toks(i + k)); k += 1 }
          grams(i) = sb.toString; i += 1
        }
        1.0 - grams.distinct.length.toDouble / n5
      }
    val topW =
      if (toks.isEmpty) 0.0
      else {
        val counts = scala.collection.mutable.HashMap.empty[String, Int]
        toks.foreach(t => counts.update(t, counts.getOrElse(t, 0) + 1))
        counts.valuesIterator.max.toDouble / toks.length
      }
    (dupLine, dup5, topW)
  }
}
