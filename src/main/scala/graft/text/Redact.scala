package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII pattern redaction for training corpora: mask personally-
  * identifying spans (emails, phone numbers) with class tags and
  * account per-document hit counts — the pre-training scrub step
  * every public-web corpus runs.
  *
  * Pure per-row `Column` work (regexp_count/regexp_replace, whole-
  * stage codegen): embarrassingly parallel, no shuffle, scales
  * linearly with corpus bytes. Patterns stay inside the common
  * Java-regex/RE2 subset (character classes, bounded quantifiers — no
  * backrefs/lookaround) so any engine applies them identically.
  */
object Redact {

  /** (pattern, replacement-tag) pairs, applied in order. */
  val defaultPatterns: Seq[(String, String)] = Seq(
    "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}" -> "<EMAIL>",
    "\\+[0-9][0-9-]{7,}" -> "<PHONE>")

  /** Redacted text: each pattern replaced (all occurrences) by its
    * tag, in sequence. */
  def redact(text: Column,
      patterns: Seq[(String, String)] = defaultPatterns): Column =
    patterns.foldLeft(text) { case (acc, (re, tag)) =>
      regexp_replace(acc, re, tag) }

  /** Hit count for one pattern class. */
  def hitCount(text: Column, pattern: String): Column =
    regexp_count(text, lit(pattern))

  /** Per-document redaction report: counts per class plus the
    * redacted text. Counts are taken on the text as each pattern
    * sees it (after earlier classes redacted), matching [[redact]]'s
    * sequential semantics. */
  def report(docs: DataFrame, textCol: String, idCol: String,
      patterns: Seq[(String, String)] = defaultPatterns): DataFrame = {
    val (out, counts) = patterns.zipWithIndex.foldLeft(
      (col(textCol), Seq.empty[Column])) {
      case ((txt, acc), ((re, tag), i)) =>
        (regexp_replace(txt, re, tag),
          acc :+ regexp_count(txt, lit(re)).cast("int").as(s"n_$i"))
    }
    docs.select(col(idCol) +: counts :+ out.as("redacted"): _*)
  }
}
