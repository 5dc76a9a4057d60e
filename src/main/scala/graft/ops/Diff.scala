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

  /**
   * Cross-source contamination matrix: for every source pair, how
   * many distinct word n-gram shingle TYPES they share, and the
   * containment ratio `shared / min(|A|, |B|)` — the provenance
   * report that finds mirrored/scraped source pairs so the mixture
   * solver can de-weight them (a pair near 1.0 is the same corpus
   * twice). Type-level (each shingle counts once per source), so a
   * boilerplate phrase repeated within one source does not inflate
   * its overlaps.
   *
   * Scale shape: each shingle is reduced MAP-SIDE to its 60-bit
   * md5-prefix key (the library's standard cross-engine hash — the
   * oracle replays it), so the distinct/type shuffle moves
   * (source, int64) rows, not gram strings — ~10× fewer bytes at
   * web-corpus shingle lengths. Key collisions under-count shared
   * types by ~|grams|²/2⁶¹ — vanishing at any real scale, identical
   * in every engine (the hash is deterministic), and irrelevant to
   * the mirrored-source signal this feeds. The pair join's fan-out is
   * bounded by the SOURCE count per key (≤ |sources|, typically
   * dozens), not document frequency, so there is no hot-key
   * quadratic: a stopword gram shared by every source contributes at
   * most |sources|² pair rows. Pair aggregation output is |sources|²
   * rows — driver-safe for any realistic source census. Shingling
   * rides the codegen kernel ([[Dedup.shingles]]).
   */
  def sourceOverlapMatrix(df: DataFrame, srcCol: String, textCol: String,
                          n: Int = 3): DataFrame = {
    // type rows feed both the per-source sizes and the pair join —
    // persist so the shingle explode+distinct runs once
    val gramKey = conv(substring(md5(col("__g").cast("binary")), 1, 15),
      16, 10).cast("decimal(38,0)").cast("long")
    val types = df.select(col(srcCol).as("src"),
      explode(Dedup.shingles(col(textCol), n)).as("__g"))
      .select(col("src"), gramKey.as("g"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = types.groupBy(col("src")).agg(count(lit(1)).as("types"))
    val out = types.as("a")
      .join(types.as("b"),
        col("a.g") === col("b.g") && col("a.src") < col("b.src"))
      .groupBy(col("a.src").as("source_a"), col("b.src").as("source_b"))
      .agg(count(lit(1)).as("shared_types"))
      .join(broadcast(sizes.select(col("src").as("source_a"),
        col("types").as("types_a"))), Seq("source_a"))
      .join(broadcast(sizes.select(col("src").as("source_b"),
        col("types").as("types_b"))), Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("shared_types"),
        col("types_a"), col("types_b"),
        round(col("shared_types") / least(col("types_a"), col("types_b")), 4)
          .as("overlap"))
      .localCheckpoint(true)
    types.unpersist()
    out
  }
}
