package graft.ops.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection / redaction for training-data preparation: emails,
  * phone numbers, and IPv4 addresses are matched with builtin regexp
  * functions (codegen'd, per-row, shuffle-free — linear at any corpus
  * size) and replaced with stable placeholder tokens so downstream
  * dedup/fingerprinting sees identical text for identically-redacted
  * documents.
  *
  * The patterns deliberately stay inside the regex subset where Java's
  * backtracking engine and RE2-style leftmost-longest engines (the
  * DuckDB oracle) agree: character classes, bounded/greedy quantifiers
  * over disjoint alphabets, no alternation whose branches can match
  * prefixes of each other. That keeps redaction byte-identical across
  * engines — important when redacted text feeds cross-system content
  * hashes.
  */
object Pii {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** International-ish phone: optional leading + or (, a digit, then
    * >= 6 chars of digits/separators, ending in a digit. Dots are
    * excluded from the separator class so IPv4 octets can never be
    * absorbed.
    */
  val PhoneRe = "[+(]?[0-9][0-9\\- ()]{6,}[0-9]"

  val Ipv4Re = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** Match counts on the ORIGINAL text (order-independent: the three
    * pattern alphabets cannot overlap on the same span).
    */
  def countEmails(c: Column): Column = regexp_count(c, lit(EmailRe))
  def countPhones(c: Column): Column = regexp_count(c, lit(PhoneRe))
  def countIpv4(c: Column): Column = regexp_count(c, lit(Ipv4Re))

  /** All three redactions chained; emails first so a phone-like digit
    * run inside a local-part can never be re-matched after the email
    * placeholder lands.
    */
  def redact(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, lit(EmailRe), lit("[EMAIL]")),
        lit(PhoneRe), lit("[PHONE]")),
      lit(Ipv4Re), lit("[IP]"))
}
