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
    require(k >= 2, "k must be >= 2")
    Seq("__u", "__rk", "n_kept", "est_distinct").foreach { c =>
      require(!df.columns.contains(c) || c == groupCol,
        s"input already has a $c column")
    }
    val hashed = df
      .where(col(valueCol).isNotNull)
      .select(col(groupCol), hashFraction(col(valueCol)).as("__u"))
      .distinct()
    val w = Window.partitionBy(groupCol).orderBy(col("__u"))
    hashed
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= k)
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_kept"), max(col("__u")).as("__uk"))
      .withColumn("est_distinct",
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(round(lit((k - 1).toDouble) / col("__uk"), 4)))
      .drop("__uk")
  }
}
