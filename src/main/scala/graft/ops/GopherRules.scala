package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * The Gopher/MassiveText document-quality rule bundle (Rae et al.
 * 2021, §A.1.1) — the published heuristic gate set crawl pipelines
 * apply before model-based filtering: word-count band, mean-word-length
 * band, symbol-to-word ratio, bullet/ellipsis line fractions,
 * alphabetic-word fraction, and stop-word presence. Complements
 * [[TextStats.qualityScore]] (a blended score) with the rule-per-flag
 * form auditors want: every rule is its own output column, so a
 * corpus report can say WHICH rule a document failed, not just that
 * it failed.
 *
 * Every rule is a pure Column expression (token higher-order
 * functions + regexes, all RE2-compatible) — codegen, no UDF, no
 * shuffle, streaming-safe, and replayed verbatim by the SQL oracle.
 * Ratio comparisons are exact-integer divisions on both engines, so
 * the pass flags cannot ulp-flip cross-engine.
 *
 * Token semantics are [[Dedup.normalizedTokens]] (the repo-wide
 * cross-engine contract); lines are newline splits of the RAW text
 * with blank lines dropped.
 */
object GopherRules {

  /** Gopher's stop-word presence set (§A.1.1: "contains at least two
    * of ..."). */
  val StopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /**
   * Per-document rule columns + the combined `gopher_pass` flag:
   *
   *   n_words            token count
   *   mean_word_len      total token chars / n_words (3 decimals)
   *   symbol_word_ratio  (# of '#' + # of '...') / n_words (4 dec)
   *   bullet_line_frac   lines starting with a bullet (•, -, *) (4 dec)
   *   ellipsis_line_frac lines ending with '...' (4 dec)
   *   alpha_word_frac    tokens containing ≥1 ASCII letter (4 dec)
   *   n_stop_present     how many of the 8 stop words appear
   *   gopher_pass        all rules hold
   *
   * Zero-token documents fail (`gopher_pass` false, ratio columns
   * NULL). Thresholds default to the paper's; the word-count band is
   * parameterized because it is corpus-dependent (the paper uses
   * [50, 100k] for web pages).
   */
  def qualityFlags(df: DataFrame, idCol: String, textCol: String,
                   minWords: Int = 50, maxWords: Int = 100000,
                   maxSymbolRatio: Double = 0.1,
                   maxBulletFrac: Double = 0.9,
                   maxEllipsisFrac: Double = 0.3,
                   minAlphaFrac: Double = 0.8,
                   minStopWords: Int = 2): DataFrame = {
    val out = Seq("n_words", "mean_word_len", "symbol_word_ratio",
      "bullet_line_frac", "ellipsis_line_frac", "alpha_word_frac",
      "n_stop_present", "gopher_pass")
    (out ++ Seq("__ws", "__ls", "__n", "__nl", "__tc", "__sy", "__bl",
      "__el", "__aw", "__sp")).foreach(c =>
      require(!df.columns.contains(c), s"input already has a $c column"))
    // STAGED projections: tokens/lines once, then the integer stats
    // once, then the output columns — each alias is referenced many
    // times downstream, and CollapseProject keeps non-cheap aliases in
    // their own projection instead of re-inlining the regex/split per
    // use (a flat single-select form measured ~5x slower: every
    // reference re-tokenized the document)
    val arrays = df.select(col(idCol), col(textCol),
      Dedup.normalizedTokens(col(textCol)).as("__ws"),
      filter(split(col(textCol), "\n"), l => trim(l) =!= "").as("__ls"))
    val stats = arrays.select(
      col(idCol),
      size(col("__ws")).as("__n"),
      size(col("__ls")).as("__nl"),
      aggregate(col("__ws"), lit(0L),
        (acc, w) => acc + length(w).cast("long")).as("__tc"),
      ((length(col(textCol)) -
        length(regexp_replace(col(textCol), "#", ""))) +
        (length(col(textCol)) -
          length(regexp_replace(col(textCol), "\\.\\.\\.", ""))) / 3)
        .as("__sy"),
      size(filter(col("__ls"), l => l.rlike("^\\s*[•\\-\\*]"))).as("__bl"),
      size(filter(col("__ls"), l => l.rlike("\\.\\.\\.\\s*$"))).as("__el"),
      size(filter(col("__ws"), w => w.rlike("[a-z]"))).as("__aw"),
      size(filter(array(StopWords.map(lit): _*),
        s => array_contains(col("__ws"), s))).as("__sp"))
    val n = col("__n")
    val nD = n.cast("double")
    val nLines = col("__nl")
    val someWords = n.isNotNull && n > 0
    val someLines = someWords && nLines > 0
    val meanLen = col("__tc").cast("double") / nD
    val symRatio = col("__sy").cast("double") / nD
    val bulletFrac = col("__bl").cast("double") / nLines.cast("double")
    val ellipsisFrac = col("__el").cast("double") / nLines.cast("double")
    val alphaFrac = col("__aw").cast("double") / nD
    stats.select(
      col(idCol),
      coalesce(n, lit(0)).cast("long").as("n_words"),
      when(someWords, round(meanLen, 3)).as("mean_word_len"),
      when(someWords, round(symRatio, 4)).as("symbol_word_ratio"),
      when(someLines, round(bulletFrac, 4)).as("bullet_line_frac"),
      when(someLines, round(ellipsisFrac, 4)).as("ellipsis_line_frac"),
      when(someWords, round(alphaFrac, 4)).as("alpha_word_frac"),
      coalesce(when(someWords, col("__sp")), lit(0))
        .cast("long").as("n_stop_present"),
      coalesce(when(someWords,
        n >= minWords && n <= maxWords &&
          meanLen >= 3.0 && meanLen <= 10.0 &&
          symRatio <= maxSymbolRatio &&
          (nLines === 0 ||
            (bulletFrac <= maxBulletFrac &&
              ellipsisFrac <= maxEllipsisFrac)) &&
          alphaFrac >= minAlphaFrac &&
          col("__sp") >= minStopWords),
        lit(false)).as("gopher_pass"))
  }
}
