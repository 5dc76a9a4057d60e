package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Web-corpus preprocessing — the two transformations every crawl-based
 * training pipeline runs before any quality/dedup stage: boilerplate
 * HTML → text extraction, and URL → host/registrable-domain parsing
 * (the grouping key for per-domain caps, blocklists, and leakage-safe
 * splits). Extension surface beyond the reference.
 *
 * Everything here is a pure Column expression chain (regexp_replace /
 * regexp_extract / split — codegen'd, no UDF, pushdown preserved
 * upstream) and every regex is RE2-compatible with inline flags, so a
 * SQL engine replays the transforms verbatim — each op carries a q-row
 * against the DuckDB oracle.
 */
object Web {

  /**
   * Visible text of an HTML document: drops script/style/noscript
   * subtrees (their CONTENT is code, not text), comments, and all
   * remaining tags (each becomes a space — adjacent text nodes stay
   * separated, matching extractor conventions); decodes the six
   * ubiquitous named entities (&amp; &lt; &gt; &quot; &#39; &nbsp;);
   * squeezes whitespace and trims. Numeric character references other
   * than &#39; are NOT decoded (a general decoder is not expressible
   * as a finite regex chain) — documented, and rare enough in crawl
   * text that extractors commonly punt the long tail too.
   *
   * `&amp;` decodes LAST so "&amp;lt;" yields the literal "&lt;"
   * (correct double-escape behavior), and tag stripping happens
   * before entity decode so decoded "<" cannot spawn phantom tags.
   */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html,
      "(?is)<(script|style|noscript)\\b[^>]*>.*?</(script|style|noscript)>", " ")
    val noComment = regexp_replace(noScript, "(?s)<!--.*?-->", " ")
    val noTag = regexp_replace(noComment, "(?s)<[^>]*>", " ")
    // the entity patterns are metacharacter-free, so they work verbatim
    // as regexes on BOTH engines (no \Q...\E quoting — RE2 lacks it)
    val ent = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTag) { case (c, (from, to)) =>
        regexp_replace(c, from, to) }
    trim(regexp_replace(ent, "\\s+", " "))
  }

  /** Lower-cased host of a URL: the authority between `://` (or a
    * protocol-relative `//`) and the first `/?#:`, with any
    * `user:pass@` credentials dropped. NULL when the value has no
    * parseable authority (relative URLs) — callers route those to a
    * default bucket explicitly rather than silently grouping them
    * under "". */
  def host(url: Column): Column = {
    // the scheme is optional so protocol-relative "//host/path" URLs
    // (common in crawled HTML attributes) parse too; the "//" itself
    // is mandatory — a bare "host/path" has no authority marker
    val h = regexp_extract(lower(trim(url)),
      "^(?:[a-z][a-z0-9+.-]*:)?//(?:[^/?#@]*@)?([^/?#:]+)", 1)
    when(h =!= "", h)
  }

  /** The ~registrable domain of a host: the last two labels, or the
    * last three when the trailing two are a known multi-part public
    * suffix (co.uk, com.au, …). A deliberate, documented APPROXIMATION
    * of the full Public Suffix List (thousands of entries, revisioned
    * upstream — not embeddable offline): `multiPartSuffixes` is the
    * knob, defaulting to the high-traffic set; hosts at or under two
    * labels pass through. The standard grouping key for per-domain
    * caps and leakage-safe splits — a path-level or subdomain-level
    * key would let one site straddle train/test. */
  def apexDomain(hostCol: Column,
                 multiPartSuffixes: Seq[String] = DefaultMultiPartSuffixes)
      : Column = {
    val labels = split(hostCol, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    val last3 = concat_ws(".", element_at(labels, -3), last2)
    when(hostCol.isNull, lit(null))
      .when(n <= 2, hostCol)
      .when(last2.isin(multiPartSuffixes: _*), last3)
      .otherwise(last2)
  }

  /** [[apexDomain]] for LARGE suffix tables: the full Public Suffix
    * List is ~9k entries, and an `isin` of that many string literals
    * builds a pathological expression tree (one branch per literal in
    * codegen). This form instead LEFT-joins each host's candidate
    * last-two-label suffix against a BROADCAST suffix frame — O(1)
    * per row via the broadcast hash table, no shuffle of `df`, and the
    * table is a runtime artifact (load the real PSL file into a Seq
    * and pass it) rather than compiled code. Appends `outCol` to `df`;
    * semantics are exactly [[apexDomain]]'s (OpsSpec pins the two
    * forms equal on shared inputs). */
  def withApexDomain(df: DataFrame, hostCol: String, outCol: String,
                     suffixes: Seq[String] = DefaultMultiPartSuffixes)
      : DataFrame = {
    require(suffixes.nonEmpty, "suffix table must be non-empty")
    Seq("__graft_last2", "__graft_psl").foreach(c =>
      require(!df.columns.contains(c), s"input already has a $c column"))
    val spark = df.sparkSession
    import spark.implicits._
    val suf = broadcast(suffixes.distinct.toDF("__graft_psl"))
    val labels = split(col(hostCol), "\\.")
    val n = size(labels)
    val last2 = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    val last3 = concat_ws(".", element_at(labels, -3), last2)
    df.withColumn("__graft_last2",
        when(col(hostCol).isNotNull && n > 2, last2))
      .join(suf, col("__graft_last2") === col("__graft_psl"), "left")
      .withColumn(outCol,
        when(col(hostCol).isNull, lit(null))
          .when(n <= 2, col(hostCol))
          .when(col("__graft_psl").isNotNull, last3)
          .otherwise(last2))
      .drop("__graft_last2", "__graft_psl")
  }

  /** High-traffic multi-part public suffixes — the approximation set
    * behind [[apexDomain]]. Swap in the full PSL where available
    * (pass it to [[apexDomain]] for small custom sets, or
    * [[withApexDomain]] for the full broadcast-joined list). */
  val DefaultMultiPartSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in", "gen.in", "firm.in",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "co.kr", "or.kr", "ne.kr", "go.kr",
    "com.mx", "org.mx", "net.mx",
    "co.za", "org.za", "net.za",
    "com.tr", "net.tr", "org.tr",
    "com.ar", "net.ar", "org.ar",
    "co.nz", "net.nz", "org.nz",
    "com.sg", "net.sg", "org.sg",
    "com.hk", "net.hk", "org.hk",
    "com.tw", "net.tw", "org.tw")
}
