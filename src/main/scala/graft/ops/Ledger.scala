package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Per-source corpus LEDGER — the mergeable accounting snapshot an
 * incremental ingest maintains instead of re-scanning history: row
 * count, token volume, and a KMV distinct-TEXT sketch per source, all
 * in one persistable frame. Yesterday's ledger + today's delta
 * snapshot MERGE exactly ([[merge]]), so corpus-level telemetry
 * (growth, dedup pressure via estimated distinct texts vs rows) costs
 * one pass over the DELTA, never the corpus — the q150 incremental
 * shape promoted from a sketch column to the whole accounting row.
 *
 * Snapshot is ONE hash aggregate (counts/sums partial map-side, the
 * KMV buffer O(k) via [[KmvAggregator]]); merge is a union + one
 * aggregate over the (tiny) source domain. The mergeability
 * invariant — snapshot(A ∪ B) == merge(snapshot(A), snapshot(B)) for
 * disjoint row sets — is pinned by the q165 oracle and OpsSpec.
 */
object Ledger {

  /** Ledger columns: (groupCol, n_docs, n_tokens, kmv). Token
    * semantics are [[TextStats.tokenCount]]'s; the sketch hashes
    * [[Dedup.normalized]] text, so `estimate` reads as "distinct
    * normalized texts" — rows minus estimate ≈ exact-dup pressure. */
  def snapshot(df: DataFrame, groupCol: String, textCol: String,
               k: Int = 64): DataFrame = {
    require(k >= 2, "k must be >= 2")
    // no groupCol exemption (mirrors Sketch.prunedHashes' hardened
    // guard): a group column named n_docs/n_tokens/kmv would collide
    // with the ledger's output columns — callers rename it first
    Seq("n_docs", "n_tokens", "kmv").foreach(c =>
      require(!df.columns.contains(c),
        s"input already has a $c column (reserved ledger name; rename it first)"))
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(TextStats.tokenCount(col(textCol)).cast("long")),
          lit(0L)).as("n_tokens"),
        KmvAggregator.kmvStateAgg(Dedup.normalized(col(textCol)), k)
          .as("kmv"))
  }

  /** Exact ledger merge: counts add, sketches take the k smallest of
    * the union ([[Sketch.kmvMergeStates]]' rule); sources on one side
    * only pass through. Correct for DISJOINT underlying row sets (the
    * ingest contract — dedup the delta against history FIRST via
    * [[Novelty]] if re-delivery is possible; double-counted rows
    * inflate counts, though the sketch, being distinct-based, does
    * not). */
  def merge(a: DataFrame, b: DataFrame, groupCol: String,
            k: Int = 64): DataFrame = {
    require(k >= 2, "k must be >= 2")
    Seq(a, b).foreach(df =>
      require(Seq(groupCol, "n_docs", "n_tokens", "kmv")
        .forall(df.columns.contains),
        s"ledger frames need ($groupCol, n_docs, n_tokens, kmv)"))
    a.unionByName(b)
      .groupBy(col(groupCol))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        slice(array_sort(array_distinct(
          flatten(collect_list(col("kmv"))))), 1, k).as("kmv"))
  }

  /** Readable report off a ledger: the sketch column becomes the
    * distinct-text estimate ([[Sketch.estimateFrom]]'s contract) and a
    * dup-pressure ratio (rows per estimated distinct text, 4 dec). */
  def report(ledger: DataFrame, groupCol: String, k: Int = 64): DataFrame =
    ledger.select(col(groupCol), col("n_docs"), col("n_tokens"),
      Sketch.estimateFrom(col("kmv"), k).as("est_distinct_texts"))
      .withColumn("dup_ratio",
        round(col("n_docs") / col("est_distinct_texts"), 4))
}
