package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data pipelines: emails, IPv4
  * addresses, and international-format phone numbers are counted and
  * replaced with typed placeholder tokens before text ships to a training
  * set.
  *
  * The patterns deliberately stay inside the dialect-portable regex subset
  * (no lookaround, no backreferences, no alternation whose leftmost-first /
  * leftmost-longest semantics could differ): the same pattern strings run
  * identically under Java regex (Spark), RE2 (DuckDB/Go tooling), and PCRE,
  * so a redaction audit can be reproduced outside the cluster.
  *
  * Scale structure: a pure narrow projection — per-row regex evaluation in
  * codegen'd `regexp_count`/`regexp_replace`, no shuffle, no UDF. Order of
  * redaction is fixed (email → ipv4 → phone) so that an IPv4-shaped host
  * inside an email address is consumed by the email redaction first. */
object Pii {

  /** Practical email shape (not full RFC 5322 — the curation tradeoff). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad with word boundaries; octet range not enforced (999.0.0.1
    * still redacts — over-redaction is the safe direction for PII). */
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** International-format phone: '+', 8-15 digits with optional single
    * space/dash separators, ending in a digit. */
  val PhonePattern = "\\+[0-9][0-9 -]{6,13}[0-9]"

  def emailCount(text: Column): Column = regexp_count(text, lit(EmailPattern))
  def ipv4Count(text: Column): Column = regexp_count(text, lit(Ipv4Pattern))
  def phoneCount(text: Column): Column = regexp_count(text, lit(PhonePattern))

  /** Redacted text: typed placeholders, fixed email → ipv4 → phone order. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>"),
      PhonePattern, "<PHONE>")

  /** Per-document PII audit + redaction: (idCol, n_emails, n_ips,
    * n_phones, has_pii, redacted). Counts are over the ORIGINAL text. */
  def scrub(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs.select(
      col(idCol),
      emailCount(t).as("n_emails"),
      ipv4Count(t).as("n_ips"),
      phoneCount(t).as("n_phones"),
      (emailCount(t) + ipv4Count(t) + phoneCount(t) > 0).as("has_pii"),
      redact(t).as("redacted"))
  }
}
