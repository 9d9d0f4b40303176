package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection/redaction — the scrubbing pass a training-data pipeline
  * runs before a corpus ships (emails, IPv4 addresses, US-SSN and
  * NANP-phone shapes; the published recipes redact these categories with
  * exactly this regex-class approach, e.g. The Pile §6.1 / BigScience
  * ROOTS sanitation).
  *
  * Scale shape: every function here is a codegen'd `regexp_replace` /
  * `regexp_count` column over the text — scan-side, embarrassingly
  * parallel, no shuffle, no UDF. Patterns are deliberately restricted to
  * the regex subset Java and RE2 interpret identically (character
  * classes, bounded repetition, alternation, ASCII `\b`; no lookaround,
  * no backreferences), so the DuckDB oracle runs the same patterns
  * verbatim and the gate hash-compares the redacted BYTES, not just
  * counts.
  *
  * Redaction order matters where patterns could overlap (an SSN is
  * never a phone — group widths differ — but IPs and dotted phones
  * share digits-and-dots): [[redact]] applies email → IP → SSN → phone,
  * and counts are taken on the ORIGINAL text so categories report
  * independently. */
object Redact {

  /** (category, pattern, replacement) in application order. */
  val patterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip",
      "\\b(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])" +
        "(\\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}\\b",
      "<IP>"),
    ("ssn", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<SSN>"),
    ("phone", "\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b", "<PHONE>"))

  /** Text with every category redacted (fixed order; see object doc). */
  def redact(text: Column): Column =
    patterns.foldLeft(text) { case (c, (_, pat, rep)) =>
      regexp_replace(c, pat, rep)
    }

  /** Match count of one category over the ORIGINAL text. */
  def countOf(text: Column, category: String): Column = {
    val pat = patterns.collectFirst { case (`category`, p, _) => p }
      .getOrElse(throw new IllegalArgumentException(
        s"unknown PII category $category (have ${patterns.map(_._1)})"))
    regexp_count(text, lit(pat))
  }
}
