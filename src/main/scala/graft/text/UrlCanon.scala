package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the crawl-pipeline normalization pass that turns
  * byte-distinct spellings of the same resource into one canonical key so
  * URL-level dedup/frontier logic can hash on it (the reference keys its
  * resume/caching on raw paths, main.py; at web scale the same document
  * arrives under casing/tracking/fragment variants).
  *
  * Rules (applied in order, all pure columnar regex — no UDFs, and every
  * pattern is RE2-compatible so the DuckDB oracle replicates the chain
  * verbatim: no lookahead/lookbehind, no backreferences in patterns):
  *   1. drop the `#fragment`;
  *   2. lowercase the `scheme://authority` prefix (path/query keep case);
  *   3. strip default ports `:80` (http) / `:443` (https);
  *   4. drop tracking params `utm_*`, `fbclid`, `gclid` wherever they appear,
  *      preserving the relative order of surviving params;
  *   5. drop a now-empty trailing `?`.
  */
object UrlCanon {

  private val Head = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"
  private val Trk = "(utm_[^=&#]*|fbclid|gclid)=[^&#]*"

  def canonicalCol(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val lowered = concat(lower(regexp_extract(noFrag, Head, 0)),
      regexp_replace(noFrag, Head, ""))
    val noPort = regexp_replace(
      regexp_replace(lowered, "^(https://[^/:?#]*):443([/?]|$)", "$1$2"),
      "^(http://[^/:?#]*):80([/?]|$)", "$1$2")
    // tracking params: (a) any in `&tail` position; (b) leading tracker
    // followed by a survivor; (c) a lone leading tracker; (d) empty `?`
    val t1 = regexp_replace(noPort, s"&$Trk", "")
    val t2 = regexp_replace(t1, s"\\?$Trk&", "?")
    val t3 = regexp_replace(t2, s"\\?$Trk$$", "")
    regexp_replace(t3, "\\?$", "")
  }
}
