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

  // ---------------------------------------------------------------
  // Payment-card numbers: a digit-run regex alone over-redacts (any
  // 13-19 digit run — order ids, timestamps, hashes); ISO/IEC 7812
  // card numbers carry a Luhn check digit, so the detector VALIDATES
  // the checksum before redacting. Pure Catalyst higher-order
  // functions — one codegen map stage, no UDF, no shuffle.
  // ---------------------------------------------------------------

  /** Luhn (mod-10) checksum over a digit-string Column: from the
    * RIGHT, double every second digit (subtracting 9 when the double
    * exceeds 9); valid iff the sum is ≡ 0 (mod 10). */
  def luhnValid(digits: Column): Column = {
    val rev = reverse(digits)
    val sum = aggregate(
      sequence(lit(0), length(digits) - 1),
      lit(0),
      (acc, j) => {
        val d = substr(rev, j + 1, lit(1)).cast("int")
        acc + when(pmod(j, lit(2)) === 1,
          when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
      })
    pmod(sum, lit(10)) === 0
  }

  /** Maximal digit runs (spaces/dashes allowed inside, digit at both
    * ends). MAXIMAL matters: a 20+-digit run must disqualify whole,
    * not donate its first 19 digits — RE2-parity regex has no
    * lookarounds, so boundary discipline comes from run maximality
    * plus the stripped-length gate. */
  private val CardRun = "[0-9][0-9 -]*[0-9]"

  /** Whether one extracted run is a Luhn-valid card: separator-
    * stripped form 13–19 digits AND checksum passes. */
  private def isCardRun(c: Column): Column = {
    val d = regexp_replace(c, "[^0-9]", "")
    length(d).between(13, 19) && luhnValid(d)
  }

  /** The Luhn-valid card candidates in `text`: maximal digit runs
    * whose separator-stripped form is 13–19 digits AND passes the
    * checksum. */
  def cardCandidates(text: Column): Column =
    filter(regexp_extract_all(text, lit(CardRun), lit(0)), isCardRun(_))

  /** `text` with every Luhn-valid card run replaced by `token` —
    * checksum-gated, so order ids and timestamps survive while real
    * PANs (with or without separators) do not.
    *
    * Replacement is POSITIONAL over the maximal-run decomposition:
    * the text splits into non-run segments (`split` on the run regex)
    * interleaved with the extracted maximal runs, and only the runs
    * that validate are swapped for the token. A substring-replace
    * (`replace(acc, run, token)`) would also rewrite a valid PAN's
    * digits wherever they appear INSIDE a longer, disqualified run
    * elsewhere in the text — corrupting non-candidate text. */
  def redactCards(text: Column, token: String = Token): Column = {
    // the checksum runs ONCE per maximal run (cardCandidates); the
    // rebuild below tests membership instead of re-validating —
    // validity is a pure function of the run string, so membership in
    // the validated list IS validity (identical runs share it)
    val valid = cardCandidates(text)
    val runs = regexp_extract_all(text, lit(CardRun), lit(0))
    // split(.., -1) keeps trailing empty segments, so segments always
    // number exactly one more than the extracted runs and re-concat
    // is byte-exact
    val segs = split(text, CardRun, -1)
    val swapped = transform(runs, c =>
      when(array_contains(valid, c), lit(token)).otherwise(c))
    // rows with no VALID run (most of any real corpus) skip the
    // split+rebuild entirely; null text stays null on both branches
    when(size(valid) <= 0, text).otherwise(
      aggregate(sequence(lit(1), size(runs)), element_at(segs, 1),
        (acc, i) => concat(acc, element_at(swapped, i),
          element_at(segs, i + 1))))
  }
}
