package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for training corpora: emails, IPv4
  * addresses and phone numbers are counted (`regexp_count`, codegen'd) and
  * replaced with typed placeholder tokens. Patterns deliberately use only
  * the regex subset whose semantics coincide between Java regex (Spark)
  * and RE2 (DuckDB, and most scrubbing stacks): character classes, bounded
  * repetition and `\b` word boundaries — no backreferences, no lookaround.
  * Everything is row-local: at 100 TB this is a pure map stage that fuses
  * into whole-stage codegen with whatever scan/filter surrounds it — no
  * shuffle, no state, no UDF.
  *
  * The reference has no PII surface (it is a GLM library); this operator
  * comes from the brief's training-data-pipeline requirement.
  */
object Pii {

  /** Local-part @ domain.tld — the pragmatic scrubbing pattern, not a
    * full RFC 5322 parser (which needs constructs RE2 lacks).
    */
  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"

  /** Dotted-quad with word boundaries; octet-range checking (≤255) is
    * left to consumers — boundary-anchored 1-3 digit groups behave
    * identically in both engines, range alternations invite dialect
    * drift.
    */
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** International-prefix phone shape +C[C]-NNN-NNN[N]-NNNN. */
  val PhoneRe = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{3,4}-[0-9]{4}"

  /** Counts are RAW per-pattern matches on the UNREDACTED text — they are
    * detection metrics, not "tokens [[redact]] will emit". The two differ
    * when patterns overlap: a dotted quad inside an email domain
    * (`10.1.2.3@ips.net`) counts toward `n_ips` but is consumed as
    * `[EMAIL]` by redaction (emails replace first). Count on the
    * email-redacted text instead if "IPs actually scrubbed as [IP]" is the
    * semantic you need.
    */
  def emailCount(c: Column): Column = regexp_count(c, lit(EmailRe))
  def ipv4Count(c: Column): Column = regexp_count(c, lit(Ipv4Re))
  def phoneCount(c: Column): Column = regexp_count(c, lit(PhoneRe))

  /** Replace every match with its typed token. Emails first (their
    * domains can embed dotted quads), then IPs, then phones — the same
    * order any oracle must replay.
    */
  def redact(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "[EMAIL]"),
        Ipv4Re, "[IP]"),
      PhoneRe, "[PHONE]")
}
