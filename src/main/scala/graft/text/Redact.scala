package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * PII redaction for training-data preparation: replace emails, IPv4
 * addresses and long digit runs (account/phone-like identifiers) with a
 * placeholder token before text enters a corpus.
 *
 * Patterns are deliberately RE2-safe (no backreferences, no lookaround) so
 * the exact same regex text behaves identically under Spark's Java regex
 * and RE2-based engines (the DuckDB oracle runs them verbatim with the 'g'
 * flag). `regexp_replace` is a codegen'd built-in — the whole redaction is
 * a narrow per-row projection, no UDF, no shuffle.
 */
object Redact {

  /** Email addresses (pragmatic RFC-lite form). */
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (syntactic; no range check — redaction favors recall). */
  val Ipv4Pattern: String = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Digit runs of 9+ (phone numbers, SSN-like ids, account numbers). */
  val LongDigitPattern: String = "\\b\\d{9,}\\b"

  val DefaultToken = "[REDACTED]"

  def redactEmails(text: Column, token: String = DefaultToken): Column =
    regexp_replace(text, EmailPattern, token)

  def redactIpv4(text: Column, token: String = DefaultToken): Column =
    regexp_replace(text, Ipv4Pattern, token)

  def redactLongDigits(text: Column, token: String = DefaultToken): Column =
    regexp_replace(text, LongDigitPattern, token)

  /** All three patterns as one alternation, tried in email -> IPv4 ->
    * digit-run order at each position (leftmost-first in both Java regex and
    * RE2, so emails and IPs win over the bare digit-run alternative). */
  val PiiPattern: String = s"$EmailPattern|$Ipv4Pattern|$LongDigitPattern"

  /** All redactions in a single regex pass (one scan of the text instead of
    * three; the alternation keeps email/IP matches ahead of digit runs). */
  def redactPii(text: Column, token: String = DefaultToken): Column =
    regexp_replace(text, PiiPattern, token)
}
