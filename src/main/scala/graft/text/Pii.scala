package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction — the anonymization pass every published
  * web-corpus pipeline runs before training (Dolma's `pii` tagger, FineWeb's
  * anonymization step): emails, North-American-style phone numbers and IPv4
  * addresses are counted and replaced with the Dolma-convention pipe markers.
  *
  * The patterns are deliberately restricted to the regex subset whose
  * semantics are IDENTICAL in Java regex (Spark codegen) and RE2 (DuckDB /
  * most SQL engines): character classes, bounded/unbounded counted
  * repetition, no backrefs, no lookaround, no \b. That keeps the operator a
  * pure built-in `regexp_count`/`regexp_replace` chain — whole-stage
  * codegen, zero shuffles, trivially 100-TB-scalable — while the driver
  * oracle (q_pii) replicates every count and every redacted byte in SQL.
  *
  * Redaction ORDER is part of the contract: emails first (an IPv4-shaped
  * mail host must disappear inside the EMAIL marker, not leave a bare IP
  * behind), then phones, then bare IPs.
  */
object Pii {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
  val Ipv4Re  = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  val EmailMark = "|||EMAIL_ADDRESS|||"
  val PhoneMark = "|||PHONE_NUMBER|||"
  val Ipv4Mark  = "|||IP_ADDRESS|||"

  def emailCount(text: Column): Column = regexp_count(text, lit(EmailRe)).cast("long")
  def phoneCount(text: Column): Column = regexp_count(text, lit(PhoneRe)).cast("long")
  def ipv4Count(text: Column): Column = regexp_count(text, lit(Ipv4Re)).cast("long")

  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, EmailMark),
        PhoneRe, PhoneMark),
      Ipv4Re, Ipv4Mark)

  /** Adds n_emails / n_phones / n_ips (counted on the ORIGINAL text) and
    * clean_text (all three kinds redacted, email → phone → ip order). */
  def annotate(df: DataFrame, textCol: String): DataFrame = df
    .withColumn("n_emails", emailCount(col(textCol)))
    .withColumn("n_phones", phoneCount(col(textCol)))
    .withColumn("n_ips", ipv4Count(col(textCol)))
    .withColumn("clean_text", redact(col(textCol)))
}
