package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data pipelines.
  *
  * A corpus headed for pretraining must strip emails, phone numbers,
  * IPs, card and social-security numbers; the standard pipeline both
  * COUNTS them (per-doc risk features that feed filtering policy) and
  * REDACTS them (replace with a class token so surrounding context
  * survives). Everything here is a pure `Column` regex expression —
  * whole-stage codegen, zero shuffle, scales as a narrow map at any
  * corpus size.
  *
  * Pattern notes (deliberately dialect-portable — no backreferences or
  * lookarounds, so the same pattern runs under Java regex and RE2):
  *  - email: practical RFC-lite (`local@domain.tld`), the form that
  *    actually leaks into scraped text;
  *  - phone: international `+CC nnn nnn nnnn` or US `(nnn) nnn-nnnn`,
  *    separators `-`, `.`, space — free-form digit runs are NOT matched
  *    (too many false positives on ids/timestamps);
  *  - card: 16 digits in `4-4-4-4` groups; no Luhn check (a regex layer
  *    flags candidates, a policy layer can post-validate);
  *  - ssn: `nnn-nn-nnnn`;
  *  - ipv4: dotted quad with word boundaries (no octet range check —
  *    same candidate-layer contract as card).
  */
object Pii {

  val emailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern: String =
    "\\+\\d{1,3}[-. ]\\d{3}[-. ]\\d{3}[-. ]\\d{4}|\\(\\d{3}\\)[-. ]\\d{3}[-. ]\\d{4}"
  val cardPattern: String = "\\b\\d{4}[- ]\\d{4}[- ]\\d{4}[- ]\\d{4}\\b"
  val ssnPattern: String = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
  val ipv4Pattern: String = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"

  private def countMatches(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  def emailCount(text: Column): Column = countMatches(text, emailPattern)
  def phoneCount(text: Column): Column = countMatches(text, phonePattern)
  def cardCount(text: Column): Column = countMatches(text, cardPattern)
  def ssnCount(text: Column): Column = countMatches(text, ssnPattern)
  def ipv4Count(text: Column): Column = countMatches(text, ipv4Pattern)

  /** Any PII class present (the filtering-policy feature). */
  def hasPii(text: Column): Column =
    emailCount(text) + phoneCount(text) + cardCount(text) +
      ssnCount(text) + ipv4Count(text) > 0

  /** Replace every PII match with its class token, context preserved.
    * Order matters and is fixed: email → phone → card → ssn → ip. Email
    * first (its local part may contain digits a later pattern would
    * shred); card/ssn before ip would also work — the classes are
    * disjoint by construction (phone needs a `+`/`(` prefix, card is
    * 4-4-4-4, ssn 3-2-4, ip has dots) — but a fixed order keeps the
    * output reproducible if patterns are ever loosened. Replacement
    * tokens contain no digits or `@`, so redaction never re-triggers. */
  def redact(text: Column): Column = {
    val steps: Seq[(String, String)] = Seq(
      emailPattern -> "[EMAIL]",
      phonePattern -> "[PHONE]",
      cardPattern -> "[CARD]",
      ssnPattern -> "[SSN]",
      ipv4Pattern -> "[IP]")
    steps.foldLeft(text) { case (acc, (p, tok)) => regexp_replace(acc, p, tok) }
  }
}
