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

  /** Raw match counts. NOTE the alphabets are NOT span-disjoint:
    * a >= 8-digit run inside an email local-part ("u12345678@...")
    * also matches PhoneRe, and a dotted quad inside a local-part
    * matches Ipv4Re — counting on the ORIGINAL text would report
    * phone/IP spans that [[redact]] (emails first) never masks. Use
    * the staged [[countPhonesAfterEmails]]/[[countIpv4AfterPhones]]
    * when the count must equal what redaction removes.
    */
  def countEmails(c: Column): Column = regexp_count(c, lit(EmailRe))
  def countPhones(c: Column): Column = regexp_count(c, lit(PhoneRe))
  def countIpv4(c: Column): Column = regexp_count(c, lit(Ipv4Re))

  /** Single-stage redactions, composable in [[redact]]'s order. */
  def redactEmails(c: Column): Column =
    regexp_replace(c, lit(EmailRe), lit("[EMAIL]"))
  def redactPhones(c: Column): Column =
    regexp_replace(c, lit(PhoneRe), lit("[PHONE]"))

  /** Phone spans the redaction chain actually masks: counted AFTER
    * email redaction, so digit runs inside a local-part (already
    * [EMAIL]) can never inflate the count.
    */
  def countPhonesAfterEmails(c: Column): Column =
    countPhones(redactEmails(c))

  /** IP spans the redaction chain actually masks (emails and phones
    * already placeholdered — placeholders carry no digits, so this
    * only removes quads that sat inside a local-part).
    */
  def countIpv4AfterPhones(c: Column): Column =
    countIpv4(redactPhones(redactEmails(c)))

  /** All three redactions chained; emails first so a phone-like digit
    * run inside a local-part can never be re-matched after the email
    * placeholder lands.
    */
  def redact(c: Column): Column =
    regexp_replace(redactPhones(redactEmails(c)), lit(Ipv4Re), lit("[IP]"))
}
