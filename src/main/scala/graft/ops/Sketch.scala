package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic distinct-count sketching — the cardinality telemetry a
 * 100 TB pipeline wants per partition/source/day WITHOUT paying an
 * exact `count(DISTINCT)` (whose hash-aggregate state is proportional
 * to the true cardinality). KMV (k-minimum-values, Bar-Yossef et al.
 * 2002): hash every value to a uniform fraction in [0,1), keep only
 * the k smallest per group; with u_k the k-th smallest, the classic
 * unbiased estimate is (k-1)/u_k. Sketch state is O(k) per group no
 * matter the cardinality, and sketches MERGE (union the hash sets,
 * re-take the k smallest) — the partial-aggregate shape Spark's own
 * `approx_count_distinct` (HLL) uses, chosen here in the KMV form
 * because the arithmetic is exactly replayable in plain SQL on any
 * engine (an HLL register array is not).
 *
 * Hash choice: md5 first 15 hex chars (60 bits) over 16^15 — the
 * repo-wide cross-engine determinism contract ([[Splits.hashBucket]]
 * rationale); 2^60 is an exact double, so the fraction is
 * bit-identical everywhere. Layout-independent by construction:
 * the same value always hashes to the same fraction, so the result
 * does not depend on partitioning, run count, or cluster size.
 */
object Sketch {

  /** Uniform [0,1) fraction from the md5 of the (stringified) value:
    * first 60 bits over 2^60. */
  def hashFraction(value: Column): Column =
    conv(substring(md5(value.cast("string").cast("binary")), 1, 15), 16, 10)
      .cast("decimal(38,0)").cast("double") / lit(math.pow(16.0, 15))

  /**
   * Per-group distinct-count estimate from a k-minimum-values sketch:
   * `n_kept` (= min(k, distinct values)), and `est_distinct` — exact
   * when the group holds fewer than k distinct values (the sketch IS
   * the value set), else (k-1)/u_k rounded to 4 decimals. NULL values
   * are ignored, matching `count(DISTINCT)`.
   *
   * Scale shape: one narrow (group, hash) projection, a distinct to
   * collapse repeats (partial-aggregated map-side — repeats of a hot
   * value never shuffle), then a rank-≤-k filter the optimizer runs
   * as WindowGroupLimit (each map task pre-prunes to its local top-k,
   * so at most tasks×k rows per group reach the final window) and a
   * ≤k-row-per-group aggregate. Nothing proportional to the true
   * cardinality crosses the wire after the distinct — and when the
   * value column is already unique per row (event ids), the distinct
   * itself is droppable by the caller feeding pre-deduped data.
   */
  def kmvDistinct(df: DataFrame, groupCol: String, valueCol: String,
                  k: Int): DataFrame = {
    prunedHashes(df, groupCol, valueCol, k)
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_kept"), max(col("__u")).as("__uk"))
      .withColumn("est_distinct",
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(round(lit((k - 1).toDouble) / col("__uk"), 4)))
      .drop("__uk")
  }

  /** Per-group (group, __u) hash fractions pruned to each group's k
    * smallest distinct values — the shared front stage of the
    * estimate and state forms. */
  private def prunedHashes(df: DataFrame, groupCol: String,
                           valueCol: String, k: Int): DataFrame = {
    require(k >= 2, "k must be >= 2")
    // no groupCol exemption: a group column NAMED __u/__rk/n_kept/
    // est_distinct would collide with the select/agg outputs and
    // produce a duplicate or ambiguous column instead of this loud
    // failure — rename the group column first
    Seq("__u", "__rk", "n_kept", "est_distinct").foreach { c =>
      require(!df.columns.contains(c),
        s"input already has a $c column (rename it — including the " +
          "group column — before sketching)")
    }
    val hashed = df
      .where(col(valueCol).isNotNull)
      .select(col(groupCol), hashFraction(col(valueCol)).as("__u"))
      .distinct()
    val w = Window.partitionBy(groupCol).orderBy(col("__u"))
    hashed
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= k)
      .drop("__rk")
  }

  /**
   * Sketch STATE form: one row per group holding the sorted array of
   * its ≤k smallest distinct hash fractions — the persistable,
   * MERGEABLE artifact (write it as parquet beside a corpus snapshot;
   * union new data's state in with [[kmvMergeStates]] instead of
   * re-scanning history). Same pruned pipeline as [[kmvDistinct]];
   * the array is ≤k doubles per group.
   */
  def kmvState(df: DataFrame, groupCol: String, valueCol: String,
               k: Int, stateCol: String = "kmv"): DataFrame =
    prunedHashes(df, groupCol, valueCol, k)
      .groupBy(groupCol)
      .agg(sort_array(collect_list(col("__u"))).as(stateCol))

  /**
   * Merge two state frames (built with the same hash and k): per
   * group, the k smallest of the UNION of hash sets. Exact, not
   * approximate — the k smallest of A ∪ B are all within the k
   * smallest of A plus the k smallest of B, so merging states loses
   * nothing vs sketching the combined data. Groups present on one
   * side only pass through. Aggregate state is ≤2k doubles per group.
   */
  def kmvMergeStates(a: DataFrame, b: DataFrame, groupCol: String,
                     k: Int, stateCol: String = "kmv"): DataFrame = {
    require(k >= 2, "k must be >= 2")
    Seq(a, b).foreach(df => require(df.columns.contains(stateCol),
      s"state frames must carry a $stateCol column"))
    a.unionByName(b)
      .groupBy(groupCol)
      .agg(slice(array_sort(array_distinct(
        flatten(collect_list(col(stateCol))))), 1, k).as(stateCol))
  }

  /** Distinct-count estimate from a state array: exact (its size)
    * under k, else (k-1)/u_k rounded to 4 decimals — the same
    * contract as [[kmvDistinct]]'s `est_distinct`. */
  def estimateFrom(state: Column, k: Int): Column =
    when(size(state) < k, size(state).cast("double"))
      .otherwise(round(lit((k - 1).toDouble) / element_at(state, k), 4))
}
