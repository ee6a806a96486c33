package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for training-data pipelines: find-and-mask emails, URLs,
  * IPv4 addresses, and phone numbers in free text. Pure `regexp_replace` /
  * `regexp_count` column expressions — codegen'd, scan-side, no shuffle; at
  * 100 TB this runs as a map-only pass fused into whatever scan feeds it.
  *
  * Pattern dialect is the RE2-compatible subset (character classes,
  * quantifiers, `\b`) so the DuckDB oracle can run the SAME patterns: no
  * lookaround, no backreferences. Replacement order matters and is fixed:
  * URLs first (they may embed `@` or dotted quads), then emails, then IPs,
  * then phones — both engines apply the identical sequence.
  */
object Redaction {

  val urlRe = "https?://[^ \\t\\n]+"
  val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val ipRe = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val phoneRe = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"

  /** The ordered (pattern, mask) pipeline applied by [[redact]]. */
  val rules: Seq[(String, String)] = Seq(
    urlRe -> "[URL]", emailRe -> "[EMAIL]", ipRe -> "[IP]",
    phoneRe -> "[PHONE]")

  /** Text with every rule's matches masked, applied in [[rules]] order. */
  def redact(c: Column): Column =
    rules.foldLeft(c) { case (acc, (re, mask)) =>
      regexp_replace(acc, re, mask)
    }

  /** Match count for one pattern (counted BEFORE any masking). */
  def countOf(c: Column, re: String): Column =
    regexp_count(c, lit(re)).cast("long")
}
