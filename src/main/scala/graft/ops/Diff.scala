package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Corpus-version diffing: row-level added/removed/changed/same status
 * between two keyed snapshots — the "what changed between crawls"
 * report that decides whether downstream recomputation (dedup,
 * decontamination, splits) can run incrementally or must be full.
 * Extension surface (no reference counterpart); complements
 * [[Profile.corpusDigest]] (which detects THAT versions differ — this
 * says WHERE) and [[Upsert.merge]] (which applies changes — this
 * audits them).
 *
 * Scale shape: each side reduces to (key, content-digest) map-side —
 * the full row never shuffles, only key + 32-char digest — then ONE
 * full-outer equi-join on the key classifies every row. With both
 * snapshots bucketed on the key ([[Layout.writeBucketed]]) even that
 * shuffle disappears.
 */
object Diff {

  /** Per-key status between `old` and `newer`: `added` (key only in
    * newer), `removed` (only in old), `changed` (digest of `cols`
    * differs), `same`. Digest columns follow the corpus-digest
    * convention (concat_ws with a chr(1) separator; nulls skip). */
  def rowDiff(old: DataFrame, newer: DataFrame, key: String,
              cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one content column")
    def digested(df: DataFrame, name: String): DataFrame =
      df.select(col(key),
        md5(concat_ws("\u0001",
          cols.map(c => col(c).cast("string")): _*).cast("binary")).as(name))
    digested(old, "__old")
      .join(digested(newer, "__new"), Seq(key), "full_outer")
      .select(col(key),
        when(col("__old").isNull, lit("added"))
          .when(col("__new").isNull, lit("removed"))
          .when(col("__old") === col("__new"), lit("same"))
          .otherwise(lit("changed")).as("status"))
  }

  /** Status totals with an order-independent membership digest per
    * status (commutative decimal key sum — the corpusDigest contract),
    * so the full assignment is pinned without materializing it. */
  def diffSummary(old: DataFrame, newer: DataFrame, key: String,
                  cols: Seq[String]): DataFrame =
    rowDiff(old, newer, key, cols)
      .groupBy("status")
      .agg(count(lit(1)).as("n_keys"),
        sum(col(key).cast("decimal(38,0)")).cast("string").as("key_digest"))
      .orderBy("status")
}
