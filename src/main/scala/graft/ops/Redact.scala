package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * PII scrubbing — the redaction pass a training-data pipeline runs
 * before anything ships (C4/RefinedWeb-style): match emails, URLs,
 * IPv4 addresses, and phone-shaped digit runs, replace them with a
 * fixed token, and report per-pattern match counts for monitoring.
 * Extension surface beyond the reference.
 *
 * Scale design: pure Catalyst `regexp_replace`/`regexp_count`
 * expressions — one codegen map stage, no shuffle, no UDF. Patterns
 * deliberately use the regex subset with identical semantics in
 * Java regex and RE2 (no lookarounds, no backreferences) so results
 * are engine-portable and DuckDB-oracle-checkable.
 *
 * Counts are computed on the ORIGINAL text per pattern (independent,
 * order-free); the replacement itself is applied sequentially in the
 * listed pattern order, which matters only when patterns overlap
 * (e.g. an email inside a URL) — document the order, don't reorder
 * silently.
 */
object Redact {

  /** (name, regex) — names become `n_<name>` count columns. */
  val Email: (String, String) =
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}")
  val Url: (String, String) = ("url", "https?://[^\\s]+")
  val Ipv4: (String, String) =
    ("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b")
  val Phone: (String, String) = ("phone", "\\+?\\d[\\d\\- ]{7,}\\d")

  val Defaults: Seq[(String, String)] = Seq(Email, Url, Ipv4, Phone)

  val Token = "[REDACTED]"

  /** Keyed pseudonymization: a stable 64-bit (16-hex-char) pseudonym
    * `md5(salt || value)` — the PII-handling transform that keeps a
    * column JOINABLE (equal values map to equal pseudonyms, so
    * retention/funnel/dedup results are invariant) while the original
    * identifier never leaves the cluster. Deterministic given the
    * salt; rotate the salt to break linkability between releases.
    * Engine-portable (md5), so an oracle can replay it. Collision
    * note: 64 bits ≈ birthday bound at ~4e9 distinct keys — widen the
    * prefix for larger identity spaces. Codegen expressions, no UDF. */
  def pseudonymize(value: Column, salt: String): Column =
    substring(md5(concat(lit(salt), value.cast("string"))), 1, 16)

  /** The text with every pattern match replaced (sequential, in
    * pattern order). `Token` contains no regex metacharacter captures,
    * so later patterns cannot re-match earlier replacements. */
  def redactText(text: Column,
                 patterns: Seq[(String, String)] = Defaults): Column =
    patterns.foldLeft(text) { case (c, (_, p)) =>
      regexp_replace(c, p, java.util.regex.Matcher.quoteReplacement(Token))
    }

  /** Adds `<textCol>_redacted` plus one `n_<name>` count column per
    * pattern (counts over the original text). */
  def redact(df: DataFrame, textCol: String,
             patterns: Seq[(String, String)] = Defaults): DataFrame = {
    val withCounts = patterns.foldLeft(df) { case (d, (name, p)) =>
      d.withColumn(s"n_$name",
        regexp_count(col(textCol), lit(p)).cast("long"))
    }
    withCounts.withColumn(s"${textCol}_redacted",
      redactText(col(textCol), patterns))
  }
}
