package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Ordered per-group sequence assembly — turning an event/turn log into
 * one training example per group (user journey, conversation
 * transcript, session trace): the group's first `maxItems` items in a
 * deterministic order, joined into a single sequence string, plus the
 * full-group size and a truncation flag.
 *
 * Scale shape: the rank-≤-maxItems filter runs BEFORE the aggregate,
 * so Spark plans it as WindowGroupLimit — each map task forwards at
 * most maxItems rows per group to the exchange, and the assembling
 * aggregate's state is bounded by maxItems regardless of how hot a
 * group is (a bot user with 10M events costs the same as anyone
 * else). The full-group count comes from a separate narrow
 * (group, count) aggregate — partial-aggregated map-side — NOT from
 * an unbounded window over the item rows, which would both carry
 * every item through the shuffle and defeat the WindowGroupLimit
 * prune (a single Window operator computing rank + count(*) together
 * disables the optimization).
 */
object Assemble {

  /**
   * One row per group: `n_items` (full group size), `truncated`
   * (n_items > maxItems), and `transcript` — the first maxItems
   * values of `itemCol` ordered by `orderCols`, joined with `sep`.
   * NULL items are skipped in the transcript (concat semantics on
   * both Spark and SQL engines) but still counted and ranked.
   * `orderCols` must be a deterministic total order within each group
   * (include a unique tiebreak column, e.g. an event id) — otherwise
   * the assembled sequence is layout-dependent.
   */
  def transcripts(df: DataFrame, groupCol: String, orderCols: Seq[String],
                  itemCol: String, maxItems: Int,
                  sep: String = ">"): DataFrame = {
    require(maxItems > 0, "maxItems must be positive")
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    Seq("__rk", "__ag", "n_items", "truncated", "transcript").foreach { c =>
      require(!df.columns.contains(c),
        s"input already has a $c column")
    }
    val w = Window.partitionBy(col(groupCol))
      .orderBy(orderCols.map(col(_).asc): _*)
    val assembled = df
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= maxItems)
      .groupBy(col(groupCol))
      .agg(array_join(transform(
          array_sort(collect_list(struct(col("__rk"), col(itemCol).as("__it")))),
          x => x.getField("__it")), sep).as("transcript"))
      .withColumnRenamed(groupCol, "__ag")
    val counts = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_items"))
    // null-safe equality: a NULL group key is a legitimate group (both
    // groupBys emit it) — a null-unsafe inner join would silently drop
    // that group's whole row instead of assembling it
    counts.join(assembled, col(groupCol) <=> col("__ag"))
      .withColumn("truncated", col("n_items") > maxItems)
      .select(col(groupCol), col("n_items"), col("truncated"),
        col("transcript"))
  }
}
