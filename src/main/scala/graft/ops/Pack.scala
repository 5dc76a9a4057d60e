package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Sequence packing — grouping chunks into fixed-token-budget packs for
 * training (the step between chunking and batch assembly). Extension
 * surface beyond the reference.
 *
 * Packing rule: CONTIGUOUS greedy fill in deterministic order — a
 * chunk joins pack `floor(tokens_before / budget)` of its group, where
 * `tokens_before` is the running token sum over the group's order.
 * Deterministic, one window shuffle, SQL-expressible (oracle-checked).
 * A pack can overshoot the budget by at most one chunk (the straddling
 * chunk stays in the pack it started in) — the standard approximation;
 * exact bin-packing is NP-hard and order-destroying, and training
 * pipelines want contiguity (document locality) anyway.
 *
 * Scale shape: the window partitions by `groupCol` (shard/source), so
 * parallelism = group count and no global ordering exists — exactly
 * how a 100 TB corpus packs per shard. Skew note: one giant group
 * serializes its own running sum; pre-shard huge sources upstream
 * (e.g. with [[Splits.hashBucket]] on doc id) to bound group size.
 */
object Pack {

  /** Assign `packCol` (DENSE 0-based pack id per group — a single row
    * larger than several budgets still only advances the id by one)
    * and `packPosCol` (0-based position within the pack). Rows are
    * ordered within each group by `orderCols`. */
  def byBudget(df: DataFrame, groupCol: String, orderCols: Seq[String],
               tokenCol: String, budget: Int,
               packCol: String = "pack_id",
               packPosCol: String = "pack_pos"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget > 0, "token budget must be positive")
    val clash = df.columns.toSet.intersect(Set("__before", "__rawpack", packCol, packPosCol))
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with Pack.byBudget's reserved/output names")
    val order = orderCols.map(col(_).asc)
    val w = Window.partitionBy(col(groupCol)).orderBy(order: _*)
    // tokens strictly before this row in group order
    val before = coalesce(
      sum(col(tokenCol)).over(w.rowsBetween(Window.unboundedPreceding, -1)),
      lit(0L))
    // dense-rank the raw floor buckets so pack ids have no gaps even
    // when one row spans multiple budgets (same partition key — the
    // extra window adds no shuffle)
    val withPack = df.withColumn("__before", before)
      .withColumn("__rawpack", floor(col("__before") / budget))
      .withColumn(packCol,
        dense_rank().over(Window.partitionBy(col(groupCol))
          .orderBy(col("__rawpack"))).cast("long") - 1)
    val wp = Window.partitionBy(col(groupCol), col(packCol)).orderBy(order: _*)
    withPack
      .withColumn(packPosCol, row_number().over(wp) - 1)
      .drop("__before", "__rawpack")
  }

  /** Per-pack digest: chunk count and token sum (oracle-checkable
    * summary of a packing run). */
  def packDigest(df: DataFrame, groupCol: String, orderCols: Seq[String],
                 tokenCol: String, budget: Int): DataFrame =
    byBudget(df, groupCol, orderCols, tokenCol, budget)
      .groupBy(col(groupCol), col("pack_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col(tokenCol)).cast("long").as("sum_tokens"))
}
