package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * C4-style LINE-level cleaning (Raffel et al. 2020 §2.2) — the
 * paragraph surgeon between whole-document gates and token-level
 * normalization: web pages carry navigation stubs, cookie banners,
 * and "enable javascript" lines INSIDE otherwise-good documents, so
 * dropping whole pages wastes good text and keeping whole pages
 * poisons it. Each line survives only if it ends in terminal
 * punctuation, carries at least `minLineWords` words, and contains no
 * boilerplate marker; the document is reassembled from the survivors.
 *
 * Pure higher-order column expressions (split → filter → array_join)
 * — map-only, codegen, streaming-safe, replayed verbatim by SQL
 * engines. Compose with [[GopherRules]]/[[TextStats.qualityScore]]
 * AFTER this pass (their ratios should judge the content, not the
 * chrome).
 */
object Lines {

  /** C4's default boilerplate markers (case-insensitive substring
    * match per line): the javascript warning, cookie banners, and
    * lorem-ipsum filler. */
  val DefaultMarkers: Seq[String] =
    Seq("javascript", "cookie policy", "lorem ipsum")

  /** The per-line keep rule as a lambda body over a line Column. */
  private def lineKeep(l: Column, minLineWords: Int,
                       markers: Seq[String]): Column = {
    val t = trim(l)
    val terminal = t.rlike("[.!?\"”]$")
    val enoughWords =
      size(filter(split(t, "\\s+"), w => w =!= "")) >= minLineWords
    val marked = markers.foldLeft(lit(false)) { (acc, m) =>
      acc || contains(lower(l), lit(m)) }
    terminal && enoughWords && !marked
  }

  /**
   * Line-filter each document: returns the input columns plus
   * `clean_text` (surviving lines rejoined with '\n'; "" when nothing
   * survives), `n_lines_kept`, and `n_lines_dropped` (blank lines
   * count as dropped). Page-level decisions stay with the caller —
   * e.g. `where(col("n_lines_kept") >= 3)` is C4's
   * at-least-N-sentences page rule.
   */
  def c4LineFilter(df: DataFrame, textCol: String,
                   minLineWords: Int = 3,
                   markers: Seq[String] = DefaultMarkers): DataFrame = {
    require(minLineWords >= 1, "minLineWords must be >= 1")
    Seq("clean_text", "n_lines_kept", "n_lines_dropped", "__lines",
      "__kept").foreach { c =>
      require(!df.columns.contains(c),
        s"input already has a $c column") }
    // staged projections (the GopherRules lesson): the line split and
    // the kept-subset each compute once, not once per consumer
    df.withColumn("__lines",
        filter(split(col(textCol), "\n"), l => trim(l) =!= ""))
      .withColumn("__kept",
        filter(col("__lines"), l => lineKeep(l, minLineWords, markers)))
      .withColumn("clean_text",
        coalesce(array_join(transform(col("__kept"), l => trim(l)), "\n"),
          lit("")))
      .withColumn("n_lines_kept",
        coalesce(size(col("__kept")), lit(0)).cast("long"))
      .withColumn("n_lines_dropped",
        (coalesce(size(col("__lines")), lit(0)) -
          coalesce(size(col("__kept")), lit(0))).cast("long"))
      .drop("__lines", "__kept")
  }
}
