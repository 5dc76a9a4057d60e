package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Entity resolution over STRUCTURED records — blocked fuzzy matching
 * (the MDM/record-linkage step: "are these two customer rows the same
 * customer?"). Complements the text near-dup family: those compare
 * free text by shingle overlap; this compares short identifying
 * FIELDS (names) by edit distance, with optional exact-match columns
 * as hard constraints.
 *
 * Scale shape: the classic blocking architecture. Records reduce
 * map-side to (block key, id, normalized name); candidate pairs come
 * from an equi-join WITHIN blocks only, so the quadratic term is
 * bounded by block size, not corpus size — and the block census is
 * CHECKED (`maxBlockSize`, loud failure) rather than assumed, the
 * same policy as SemDeDup's cell guard: a degenerate blocking key
 * (everyone named "the") must fail loudly, not silently go O(n²).
 * Verification (Levenshtein ratio) runs only on the candidate set.
 * Pure built-in expressions throughout (`levenshtein` is codegen'd),
 * and DuckDB replays the identical normalize/block/ratio arithmetic.
 *
 * Matched pairs feed [[Dedup.componentsOf]] for transitive entity
 * ids, exactly like the near-dup cluster path (q81).
 */
object Entity {

  /** Name normalization shared by blocking and verification (and the
    * SQL oracle): lowercase, strip non-alphanumerics (keeping
    * spaces), squeeze whitespace. */
  def normalizedName(c: Column): Column =
    regexp_replace(
      regexp_replace(lower(trim(c)), "[^a-z0-9 ]", ""),
      "\\s+", " ")

  /**
   * Candidate match pairs: records sharing a block key whose
   * Levenshtein similarity `1 - lev/maxLen` reaches `minSim`, with
   * every column in `exactCols` equal. Returns (id_a, id_b, sim) with
   * id_a < id_b.
   *
   * TWO blocking passes, unioned before verification: the first
   * `blockChars` of the normalized name (primary), and the LAST
   * `blockChars` (secondary). A single prefix key misses any match
   * whose typo lands inside the prefix ("Jonh Smith" vs "John Smith"
   * at blockChars 4 never share a block); with the suffix pass a pair
   * escapes candidacy only when edits hit BOTH the first and last
   * `blockChars`, or its suffix block was purged — the residual
   * recall gap, documented rather than hidden. The suffix join keeps
   * only pairs whose PREFIX keys differ, so the two passes are
   * disjoint by construction and the union needs no distinct (no
   * dedup shuffle).
   *
   * Skew policy differs by pass, deliberately:
   *  - `maxBlockSize` guards the PRIMARY key: its census is computed
   *    first and the call fails loudly if any prefix block exceeds it
   *    — an unselective primary key is a configuration error
   *    (re-block with more characters or add `exactCols`).
   *  - `maxSuffixBlock` PURGES the secondary key (record-linkage
   *    block purging): a suffix block above the cap is skipped, its
   *    records falling back to prefix-pass recall only. Name suffixes
   *    are structurally low-entropy in many corpora (company suffixes
   *    "inc"/"ltd", catalog color words), and a typo-recall
   *    supplement must not be allowed to go quadratic on them — cost
   *    stays bounded, and the purge rule is exactly replayable by an
   *    oracle (census + filter).
   */
  def matchPairs(df: DataFrame, idCol: String, nameCol: String,
                 blockChars: Int = 3, minSim: Double = 0.8,
                 exactCols: Seq[String] = Nil,
                 maxBlockSize: Int = 10000,
                 maxSuffixBlock: Int = 64): DataFrame = {
    require(blockChars >= 1, "blockChars must be >= 1")
    require(minSim > 0.0 && minSim <= 1.0, "minSim must be in (0, 1]")
    require(maxSuffixBlock >= 0,
      "maxSuffixBlock must be >= 0 (0 disables the suffix pass)")
    val nm = normalizedName(col(nameCol))
    val keyed = df.select(
      (col(idCol).as("__id") +: nm.as("__nm") +: exactCols.map(col)): _*)
      .where(col("__nm") =!= "")
      // suffix start is explicit 1-clamped arithmetic (not a negative
      // substring position) so short names behave identically on every
      // engine replaying this blocking
      .withColumn("__bp", substring(col("__nm"), 1, blockChars))
      .withColumn("__bs", col("__nm").substr(
        greatest(length(col("__nm")) - lit(blockChars - 1), lit(1)),
        lit(blockChars)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // loud skew guard on the primary key (bounded driver read: ONE max
    // over the census)
    val worst = keyed.groupBy(col("__bp"))
      .agg(count(lit(1)).as("__n"))
      .agg(max(col("__n"))).head()
    val worstN = if (worst.isNullAt(0)) 0L else worst.getLong(0)
    require(worstN <= maxBlockSize,
      s"largest block has $worstN records (> maxBlockSize $maxBlockSize); " +
        "raise blockChars or add exactCols before pairing")
    def sideCols(idAs: String, nmAs: String, xTag: String) =
      col("__id").as(idAs) +: col("__nm").as(nmAs) +:
        exactCols.map(c => col(c).as(s"__x${xTag}_$c"))
    val joinCond = exactCols.foldLeft(col("id_a") < col("id_b")) {
      case (cond, c) => cond && col(s"__xa_$c") === col(s"__xb_$c") }
    val maxLen = greatest(length(col("__na")), length(col("__nb")))
    // LOSSLESS length prefilter ahead of the Levenshtein call:
    // lev(a,b) >= |len(a)-len(b)|, so any pair whose length gap
    // exceeds the edit budget maxLen*(1-minSim) cannot reach minSim
    // (+1 edit of slack absorbs the 4-decimal rounding boundary).
    // Within a hot block this prunes most candidates for pennies —
    // one abs/compare versus an O(len²) edit-distance kernel.
    val lenGate =
      abs(length(col("__na")) - length(col("__nb"))) <=
        maxLen * (1.0 - minSim) + 1.0
    val candPrefix = keyed
      .select(col("__bp").as("__blk") +: sideCols("id_a", "__na", "a"): _*)
      .join(keyed.select(col("__bp").as("__blk") +:
        sideCols("id_b", "__nb", "b"): _*), Seq("__blk"))
      .where(joinCond && lenGate)
    // block purging: records in oversized suffix blocks sit out the
    // secondary pass (ONE narrow window count keyed like the join
    // itself — no extra census job shape)
    val wS = Window.partitionBy(col("__bs"))
    val keyedS = keyed
      .withColumn("__bsn", count(lit(1)).over(wS))
      .where(col("__bsn") <= maxSuffixBlock)
      .drop("__bsn")
    val candSuffix = keyedS
      .select(col("__bs").as("__blk") +: col("__bp").as("__pa") +:
        sideCols("id_a", "__na", "a"): _*)
      .join(keyedS.select(col("__bs").as("__blk") +: col("__bp").as("__pb") +:
        sideCols("id_b", "__nb", "b"): _*), Seq("__blk"))
      // prefix-disjointness: pairs sharing a prefix block are already
      // pass-1 candidates — excluding them here makes the union exact
      // without a pair-level distinct
      .where(joinCond && lenGate && col("__pa") =!= col("__pb"))
      .drop("__pa", "__pb")
    val sim = lit(1.0) - levenshtein(col("__na"), col("__nb")) / maxLen
    val out = candPrefix.unionByName(candSuffix)
      .select(col("id_a"), col("id_b"), round(sim, 4).as("sim"))
      .where(col("sim") >= minSim)
      .localCheckpoint(true)
    keyed.unpersist()
    out
  }

  /** Transitive entity ids from a matched-pair frame: every record in
    * `df` gets the smallest id of its match-connected component (its
    * own id if unmatched) — the same min-label closure as the
    * near-dup cluster path. */
  def entityIds(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val comp = Dedup.componentsOf(pairs.select(col("id_a"), col("id_b")))
    df.join(comp.select(col("node").as(idCol), col("comp")),
        Seq(idCol), "left")
      .withColumn("entity_id", coalesce(col("comp"), col(idCol)))
      .drop("comp")
  }
}
