package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Unicode-confusable (homoglyph) folding — the dedup/spam-evasion
 * counter every crawl pipeline eventually needs: "pаypal" with a
 * Cyrillic а is a DIFFERENT string to every hash-keyed dedup, byte
 * filter, and blocklist, while rendering identically to a reader.
 * Folding confusables onto their Latin skeletons BEFORE keying makes
 * the evasion visible (UTS #39's "skeleton" idea, restricted here to
 * a curated high-traffic subset — the full confusables.txt is tens of
 * thousands of multi-char mappings and revisioned upstream; the
 * mapping table is the documented knob).
 *
 * The fold is a single `translate` over [[Dedup.normalized]] text —
 * pure codegen, map-only, and replayed verbatim by SQL engines
 * (`translate` is character-wise in both Spark and DuckDB).
 */
object Confusables {

  /** Curated 1:1 confusable→Latin mapping: Cyrillic and Greek
    * lowercase lookalikes plus fullwidth Latin letters and digits.
    * Applied AFTER lowercasing ([[Dedup.normalized]]), so only
    * lowercase sources are needed. */
  val Mapping: Seq[(Char, Char)] = {
    val cyrillic = Seq(
      'а' -> 'a', 'е' -> 'e', 'о' -> 'o', 'р' -> 'p', 'с' -> 'c',
      'х' -> 'x', 'у' -> 'y', 'і' -> 'i', 'ѕ' -> 's', 'ј' -> 'j',
      'һ' -> 'h', 'ԁ' -> 'd', 'ԛ' -> 'q', 'ԝ' -> 'w', 'ь' -> 'b',
      'м' -> 'm', 'т' -> 't', 'к' -> 'k', 'в' -> 'b', 'н' -> 'h')
    val greek = Seq(
      'α' -> 'a', 'ο' -> 'o', 'ν' -> 'v', 'ε' -> 'e', 'ι' -> 'i',
      'κ' -> 'k', 'ρ' -> 'p', 'τ' -> 't', 'υ' -> 'u', 'η' -> 'n',
      'χ' -> 'x', 'ω' -> 'w', 'ϲ' -> 'c')
    val fullwidthLetters = ('a' to 'z').map(c =>
      (0xFF41 + (c - 'a')).toChar -> c)
    val fullwidthDigits = ('0' to '9').map(c =>
      (0xFF10 + (c - '0')).toChar -> c)
    cyrillic ++ greek ++ fullwidthLetters ++ fullwidthDigits
  }

  private val fromChars = Mapping.map(_._1).mkString
  private val toChars = Mapping.map(_._2).mkString

  /** The confusable skeleton of a text: [[Dedup.normalized]] (lower,
    * trim, whitespace-squeeze) with every mapped confusable folded to
    * its Latin form. Two strings with equal skeletons render
    * near-identically; key dedup/blocklists on THIS, not the raw
    * normalized text. */
  def skeleton(text: Column): Column =
    translate(Dedup.normalized(text), fromChars, toChars)

  /** Exact dedup keyed on the confusable skeleton: the smallest id per
    * skeleton survives — catches duplicates that [[Dedup.exact]]'s
    * byte-level normalized key provably cannot (a single substituted
    * homoglyph changes that key). Same one-scan / one-narrow-shuffle
    * shape as [[Dedup.exact]]. */
  def dropConfusableDuplicates(df: DataFrame, idCol: String,
                               textCol: String): DataFrame =
    Dedup.winnerByKey(df, xxhash64(skeleton(col(textCol))),
      Seq(col(idCol).asc), "Confusables.dropConfusableDuplicates")

  /** The fold as a SQL `translate(...)` call over an already-
    * normalized expression — interpolating the mapping from the ONE
    * Scala table so an oracle replay cannot drift from [[skeleton]].
    * (No single quotes occur in the mapping characters.) */
  def skeletonSql(normalizedExpr: String): String =
    s"translate($normalizedExpr, '$fromChars', '$toChars')"

  /** Per-document homoglyph telemetry: how many characters the fold
    * changed — a spike flags an evasion campaign or a mis-decoded
    * source. Map-only length-difference arithmetic (character counts,
    * not bytes, on both engines). */
  def foldedCharCount(text: Column): Column = {
    val norm = Dedup.normalized(text)
    // characters REMOVED by deleting every mapped char (translate with
    // empty targets) = how many positions the fold would touch
    length(norm) - length(translate(norm, fromChars, ""))
  }
}
