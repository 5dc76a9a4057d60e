package graft.text

import org.apache.spark.ml.feature.{StopWordsRemover, Tokenizer}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text normalization dataflow. Reference semantics
 * (`/root/reference/.../utils/Helper.scala:33-65`):
 *
 *   null-filter -> tweet tokenize -> emoji->word -> cleanString
 *   [-> Porter stem (before cleaning, see below)]
 *   -> whitespace Tokenizer -> StopWordsRemover -> concat_ws(" ")
 *
 * `cleanString` exists in two equivalent forms:
 *  - [[cleanString]] (String => String) used inside the composite UDF, and
 *  - [[cleanStringCol]], the same regex chain as native Catalyst
 *    expressions (lower/regexp_replace), which stays inside whole-stage
 *    codegen and is the form used when the tweet-tokenizer stage is not
 *    required. At 100 TB the native form is strictly preferable; the UDF
 *    form exists for reference parity of the full chain.
 */
object TextClean {

  // The reference chain (`utils/Helper.scala:77-84`) calls
  // String.replaceAll per rule, recompiling every regex on every row;
  // in the hot UDF we precompile once (same matching semantics).
  private val PQuotes = java.util.regex.Pattern.compile("[\"']")
  private val PBreaks = java.util.regex.Pattern.compile("[\\n\\r\\t]")
  private val PRt = java.util.regex.Pattern.compile("rt\\s+")
  private val PMention = java.util.regex.Pattern.compile("@\\w+")
  private val PHash = java.util.regex.Pattern.compile("#")
  private val PUrl = java.util.regex.Pattern.compile("http\\S+")
  private val PSpaces = java.util.regex.Pattern.compile(" +")
  private val PWs = java.util.regex.Pattern.compile("\\s+")

  /** Exact reference regex chain (`utils/Helper.scala:77-84`): lowercase;
    * drop quotes; drop line breaks/tabs; drop "rt " retweet markers,
    * @mentions, '#' prefixes; drop http URLs; squeeze whitespace. */
  def cleanString(text: String): String = {
    var x = text.toLowerCase
    x = PQuotes.matcher(x).replaceAll("")
    x = PBreaks.matcher(x).replaceAll("")
    x = PRt.matcher(x).replaceAll("")
    x = PMention.matcher(x).replaceAll("")
    x = PHash.matcher(x).replaceAll("")
    x = PUrl.matcher(x).replaceAll("")
    x = PSpaces.matcher(x).replaceAll(" ")
    PWs.matcher(x).replaceAll(" ")
  }

  /** [[cleanString]] as a codegen-friendly Column expression chain. */
  def cleanStringCol(c: Column): Column = {
    var x = lower(c)
    x = regexp_replace(x, "[\"']", "")
    x = regexp_replace(x, "[\\n\\r\\t]", "")
    x = regexp_replace(x, "rt\\s+", "")
    x = regexp_replace(x, "@\\w+", "")
    x = regexp_replace(x, "#", "")
    x = regexp_replace(x, "http\\S+", "")
    regexp_replace(regexp_replace(x, " +", " "), "\\s+", " ")
  }

  def stemString(text: String): String =
    text.split(" ").map(Stemmer.stem).mkString(" ")

  /** Full per-row clean: tweet tokenize -> emoji substitution -> clean. */
  def cleanText(emoji: Map[String, String])(text: String): String =
    cleanString(Emoji.toWords(emoji)(TweetTokenizer.tokenizeToString(text)))

  /** Stemming variant. NB reference order: the Porter stemmer runs on the
    * RAW text (including URLs/@mentions) BEFORE cleaning
    * (`utils/Helper.scala:34,100-102`). */
  def cleanTextAndStem(emoji: Map[String, String])(text: String): String =
    cleanText(emoji)(stemString(text))

  /**
   * Reference `Helper.cleanSource`: adds `outputCol` with the normalized,
   * stop-word-free text. The emoji table travels as a broadcast (fixing
   * the reference's driver-only `@transient var`, SURVEY.md Q2).
   *
   * Scale notes: one narrow map stage (no shuffle); the UDF is the only
   * non-codegen link. Column pruning still applies upstream because the
   * UDF reads a single column.
   */
  def cleanSource(df: DataFrame, inputCol: String, outputCol: String,
                  stem: Boolean,
                  emoji: Map[String, String] = Emoji.base): DataFrame = {
    // Ship the emoji table inside the UDF closure (it serializes once
    // per stage into the task binary — no per-call Broadcast object to
    // leak, fixing round-1 review note #4). The default table is the
    // 71-entry emoticon map; the full 843-row CSV table is a per-JVM
    // lazy singleton when callers pass Emoji.fromResourceTable.
    val cleanUdf =
      if (stem) udf((s: String) => cleanTextAndStem(emoji)(s))
      else udf((s: String) => cleanText(emoji)(s))

    // Collision-proof intermediate names (round-1 review note: a real
    // input column named converted_text/tokens_* would be lost).
    val sfx = java.lang.Integer.toHexString(
      java.util.Arrays.hashCode(df.columns.asInstanceOf[Array[AnyRef]]))
    val cConv = s"__graft_conv_$sfx"
    val cTokRaw = s"__graft_tokraw_$sfx"
    val cTokClean = s"__graft_tokclean_$sfx"

    val cleaned = df.where(col(inputCol).isNotNull)
      .withColumn(cConv, cleanUdf(col(inputCol)))

    val tokenizer = new Tokenizer()
      .setInputCol(cConv).setOutputCol(cTokRaw)
    val remover = new StopWordsRemover()
      .setInputCol(cTokRaw).setCaseSensitive(false)
      .setOutputCol(cTokClean)
    remover.transform(tokenizer.transform(cleaned))
      .withColumn(outputCol, concat_ws(" ", col(cTokClean)))
      .drop(cTokRaw, cTokClean, cConv)
  }

  /** The default English stop-word list used by [[cleanSource]], exposed
    * so tests and SQL oracles can pin it. */
  def stopWords: Array[String] = StopWordsRemover.loadDefaultStopWords("english")
}
