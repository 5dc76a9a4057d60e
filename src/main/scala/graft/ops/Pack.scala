package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sequence packing — grouping chunks into fixed-token-budget packs for
 * training (the step between chunking and batch assembly). Extension
 * surface beyond the reference.
 *
 * Two complementary shapes:
 *  - [[byBudget]]/[[packDigest]]: CONTIGUOUS greedy fill within a
 *    caller-supplied group and order (chunk-level packing, q46).
 *  - [[packPlan]]/[[packSummary]]: the concat-and-chunk TRAINING
 *    LAYOUT (GPT/LLaMA style) — documents laid end-to-end in a
 *    seeded md5 order across shards, token offsets and context-window
 *    spans computed exactly (q136/q137).
 *
 * Packing rule for [[byBudget]]: a chunk joins pack
 * `floor(tokens_before / budget)` of its group, where `tokens_before`
 * is the running token sum over the group's order. Deterministic, one
 * window shuffle, SQL-expressible (oracle-checked). A pack can
 * overshoot the budget by at most one chunk (the straddling chunk
 * stays in the pack it started in) — the standard approximation;
 * exact bin-packing is NP-hard and order-destroying, and training
 * pipelines want contiguity (document locality) anyway.
 *
 * Scale shape (both forms): the window partitions by the group/shard
 * column, so parallelism = group count and no global ordering exists —
 * exactly how a 100 TB corpus packs per shard. Skew note: one giant
 * group serializes its own running sum; pre-shard huge sources
 * upstream (e.g. with [[Splits.hashBucket]] on doc id) to bound group
 * size — [[packPlan]] does this intrinsically via its `shards` knob.
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

  /**
   * Concat-and-chunk packing PLAN: one row per (non-empty) document
   * with its shard, order key, token offsets in the shard's
   * concatenated stream, and the first/last context window (`seqLen`
   * tokens each) it lands in. The plan is what a training reader
   * needs to place each document; the token materialization happens
   * at read time. `first_seq != last_seq` marks a boundary-crossing
   * document (its tokens straddle windows — the accepted cost of
   * chunk packing; readers that mask cross-document attention need
   * this flag). Zero-token documents occupy no stream positions and
   * are excluded.
   *
   * Order is [[Splits.shardOrder]]'s seeded 60-bit md5 key (ties
   * broken by id), so the layout is stable across runs, partition
   * layouts, and cluster sizes — resumable epochs address
   * (shard, seq_index) and always see the same tokens there. ONE hash
   * shuffle (by shard) + a per-shard sort feeding a running-sum
   * window — no global sort, no single-partition window; size
   * `shards` so tokens-per-shard fits an executor's sort budget.
   * All-integer arithmetic — the DuckDB oracle replays the md5 key
   * and the window sum exactly.
   */
  def packPlan(df: DataFrame, idCol: String, nTokens: Column,
               shards: Int, seqLen: Int, seed: Long = 0): DataFrame = {
    require(shards > 0, "shards must be positive")
    require(seqLen > 0, "seqLen must be positive")
    require(!Set("shard", "sort_key", "n_tokens", "start_off",
      "first_seq", "last_seq").contains(idCol),
      s"idCol '$idCol' collides with packPlan's output names")
    val keyed = Splits.shardOrder(
      df.select(col(idCol), nTokens.cast("long").as("n_tokens"))
        .where(col("n_tokens") >= 1),
      idCol, shards, seed)
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("sort_key"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    keyed
      .withColumn("start_off", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col(idCol), col("shard"), col("sort_key"), col("n_tokens"),
        col("start_off"),
        // integral `div`, not double division + cast: offsets at
        // corpus scale can exceed a double's 2^53 exact-integer range
        expr(s"start_off div $seqLen").as("first_seq"),
        expr(s"(start_off + n_tokens - 1) div $seqLen").as("last_seq"))
  }

  /** Per-shard packing economics: documents, tokens, full `seqLen`
    * windows (`ceil`), padding in the final window, and how many
    * documents straddle a window boundary. One aggregate over the
    * plan. */
  def packSummary(plan: DataFrame, seqLen: Int): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    plan.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(when(col("first_seq") =!= col("last_seq"), 1L)
          .otherwise(0L)).as("boundary_docs"))
      // integral ceil-div (see packPlan): exact past 2^53
      .withColumn("n_seqs",
        expr(s"(total_tokens + ${seqLen - 1}) div $seqLen"))
      .withColumn("pad_tokens",
        col("n_seqs") * seqLen - col("total_tokens"))
      .select(col("shard"), col("n_docs"), col("total_tokens"),
        col("n_seqs"), col("pad_tokens"), col("boundary_docs"))
  }
}
