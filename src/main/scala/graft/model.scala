package graft

import java.sql.Timestamp

/** Core row types of the extraction engine.
  *
  * The input table shape is pinned by the north rule
  * (`BASELINE.json:input_hint`): Common-Crawl-style pages
  * `(url, warc_ts, html, text, lang)`. Everything downstream is a typed
  * Dataset over these case classes (SURVEY.md §1.3).
  */
final case class PageRow(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** Character-span offset of one kept block inside the final extracted text.
  * Required by the north rule ("extracted text and character-span offsets");
  * absent in the reference, which emits text only (SURVEY.md §2.4 X5). */
final case class Span(start: Int, end: Int, block_kind: String)

/** Output of the extraction stage (one row per page).
  *
  * Mirrors the reference's per-file result dict
  * (reference: src/services/RAG/convert_to_embeddings.py:341-430) with the
  * skip/err-with-reason discipline of
  * convert_to_embeddings.py:357-365,642-655: a bad document yields an `err`
  * row, never a crashed partition.
  */
final case class ExtractedDoc(
    url: String,
    kind: String,        // pdf | html | unknown
    text: String,        // extracted main text ("" when empty/err)
    spans: Seq[Span],
    method: String,      // strict | lenient | body | text_layer | empty_text | err
    n_blocks: Int,
    n_chars: Int,
    err: String)         // "" when ok

/** One chunk of one document, reference semantics
  * (reference: src/services/RAG/chunking.py:6-61, ids
  * convert_to_embeddings.py:383-413). */
final case class ChunkRow(
    id: String,
    url: String,
    chunk_index: Int,
    total_chunks: Int,
    text: String,
    chunk_hash: String,
    is_duplicate: Boolean,
    duplicate_of_index: Int)

object Hashing {
  // one digest instance per thread (getInstance + provider lookup per call
  // is measurable at chunk granularity); reset() via digest() semantics
  private val sha1Local = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("SHA-1"))
  private val sha256Local = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("SHA-256"))

  /** Lowercase hex SHA-1, the reference's chunk-hash primitive
    * (reference: src/services/RAG/chunking.py:45-47). */
  def sha1Hex(s: String): String =
    hex(sha1Local.get().digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)))

  /** Lowercase hex SHA-256 (reference: src/services/RAG/cache_utils.py:10-15). */
  def sha256Hex(b: Array[Byte]): String =
    hex(sha256Local.get().digest(b))

  def sha256Hex(s: String): String =
    sha256Hex(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  private val HexChars = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): String = {
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      val v = d(i) & 0xff
      out(i * 2) = HexChars(v >>> 4)
      out(i * 2 + 1) = HexChars(v & 0xf)
      i += 1
    }
    new String(out)
  }

  private val md5Local = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** First 8 bytes of MD5(UTF-8 bytes), big-endian, as a Long (bit pattern —
    * interpret unsigned). The near-dup primitives (MinHash shingles, SimHash
    * features) hash with THIS so the DuckDB oracle can reproduce them
    * exactly: `('0x' || substr(md5(s), 1, 16))::UBIGINT` yields the same 64
    * bits. */
  def md5Long(s: String): Long = {
    val d = md5Local.get().digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
    ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
    ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
  }

  /** Stable 64-bit FNV-1a over UTF-8 bytes. Used wherever the engine needs a
    * cheap deterministic 64-bit hash that must not depend on JVM/Spark
    * internals (salting in unit tests). */
  def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** splitmix64 finalizer — turns sequential/biased longs into well-mixed
    * ones (public-domain algorithm, Steele et al., JDK SplittableRandom). */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}
