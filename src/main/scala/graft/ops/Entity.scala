package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
   * Candidate match pairs: records sharing a block key (first
   * `blockChars` of the normalized name) whose Levenshtein similarity
   * `1 - lev/maxLen` reaches `minSim`, with every column in
   * `exactCols` equal. Returns (id_a, id_b, sim) with id_a < id_b.
   *
   * `maxBlockSize` is the skew guard: the block census is computed
   * first and the call fails loudly if any block exceeds it —
   * re-block with more characters or add an `exactCols` constraint
   * instead of letting one hot block degenerate to a cartesian.
   */
  def matchPairs(df: DataFrame, idCol: String, nameCol: String,
                 blockChars: Int = 3, minSim: Double = 0.8,
                 exactCols: Seq[String] = Nil,
                 maxBlockSize: Int = 10000): DataFrame = {
    require(blockChars >= 1, "blockChars must be >= 1")
    require(minSim > 0.0 && minSim <= 1.0, "minSim must be in (0, 1]")
    val keyed = df.select(
      (col(idCol).as("__id") +:
        substring(normalizedName(col(nameCol)), 1, blockChars).as("__blk") +:
        normalizedName(col(nameCol)).as("__nm") +:
        exactCols.map(col)): _*)
      .where(col("__nm") =!= "")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // loud skew guard (bounded driver read: ONE max over the census)
    val worst = keyed.groupBy(col("__blk"))
      .agg(count(lit(1)).as("__n"))
      .agg(max(col("__n"))).head()
    val worstN = if (worst.isNullAt(0)) 0L else worst.getLong(0)
    require(worstN <= maxBlockSize,
      s"largest block has $worstN records (> maxBlockSize $maxBlockSize); " +
        "raise blockChars or add exactCols before pairing")
    val a = keyed.select(col("__blk") +: col("__id").as("id_a") +:
      col("__nm").as("__na") +: exactCols.map(c => col(c).as(s"__xa_$c")): _*)
    val bSide = keyed.select(col("__blk") +: col("__id").as("id_b") +:
      col("__nm").as("__nb") +: exactCols.map(c => col(c).as(s"__xb_$c")): _*)
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
    val sim = lit(1.0) - levenshtein(col("__na"), col("__nb")) / maxLen
    val out = a.join(bSide, Seq("__blk"))
      .where(joinCond && lenGate)
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
