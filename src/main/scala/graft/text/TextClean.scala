package graft.text

import org.apache.spark.broadcast.Broadcast
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

  /** Exact reference regex chain (`utils/Helper.scala:77-84`): lowercase;
    * drop quotes; drop line breaks/tabs; drop "rt " retweet markers,
    * @mentions, '#' prefixes; drop http URLs; squeeze whitespace. */
  def cleanString(text: String): String = {
    text.toLowerCase
      .replaceAll("\"", "").replaceAll("'", "")
      .replaceAll("\n", "").replaceAll("\r", "").replaceAll("\t", "")
      .replaceAll("rt\\s+", "").replaceAll("@\\w+", "").replaceAll("#", "")
      .replaceAll("http\\S+", "")
      .replaceAll(" +", " ").replaceAll("\\s+", " ")
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
    val bc: Broadcast[Map[String, String]] =
      df.sparkSession.sparkContext.broadcast(emoji)
    val cleanUdf =
      if (stem) udf((s: String) => cleanTextAndStem(bc.value)(s))
      else udf((s: String) => cleanText(bc.value)(s))

    val cleaned = df.where(col(inputCol).isNotNull)
      .withColumn("converted_text", cleanUdf(col(inputCol)))

    val tokenizer = new Tokenizer()
      .setInputCol("converted_text").setOutputCol("tokens_raw")
    val remover = new StopWordsRemover()
      .setInputCol("tokens_raw").setCaseSensitive(false)
      .setOutputCol("tokens_clean")
    remover.transform(tokenizer.transform(cleaned))
      .withColumn(outputCol, concat_ws(" ", col("tokens_clean")))
      .drop("tokens_raw", "tokens_clean", "converted_text")
  }

  /** The default English stop-word list used by [[cleanSource]], exposed
    * so tests and SQL oracles can pin it. */
  def stopWords: Array[String] = StopWordsRemover.loadDefaultStopWords("english")
}
