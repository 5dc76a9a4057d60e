package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

/**
 * Token-budget corpus selection: keep the highest-quality documents
 * whose cumulative token count fits a fixed training budget — the
 * "we can afford N tokens, take the best ones" curation step that
 * sits after scoring/dedup in an LLM data pipeline. Extension
 * surface; no reference citation (the reference is batch sentiment
 * only).
 *
 * Semantics (exact, order-defined): documents are ranked by
 * (quality DESC, id ASC); a document is kept iff the running token
 * sum up to and including it is ≤ `budget`. Equivalent SQL:
 * `SUM(tokens) OVER (ORDER BY quality DESC, id) <= budget` — which
 * is exactly what the q105 DuckDB oracle replays.
 *
 * Scale design (100 TB): the naive form — a windowed running sum
 * over a GLOBAL order — collapses to a single partition, the classic
 * window scale-killer. Instead the global cumsum is decomposed:
 *
 *  1. per-quality token totals: one narrow hash aggregate whose key
 *     domain is the score granularity, not the corpus
 *     ([[graft.ops.TextStats.qualityScore]] rounds to 3 decimals →
 *     ≤ 1001 distinct keys);
 *  2. the driver turns those totals into strictly-higher-quality
 *     prefix sums (a bounded ≤1001-row collect, same class as the
 *     category collects in `schema/Detection`);
 *  3. the prefixes broadcast-join back and each document's exact
 *     global cumsum is `prefix(quality) + running-sum WITHIN its
 *     quality value` — a window PARTITIONED by quality, so the sort
 *     is distributed across the score domain instead of funneling
 *     the corpus through one task. The widest partition is one
 *     quality value (~1/granularity of the corpus), and only the
 *     budget boundary actually needs its ordering — Spark prunes
 *     nothing further here, but the per-partition sort is linearithmic
 *     in the slice, not the corpus.
 *
 * Rows with a NULL quality are ineligible (never selected): a budget
 * is a ranking over scores, and an unscored document has no rank.
 */
object Budget {

  /** Exact budget selection. Returns the kept rows with a `cumCol`
    * running-total column (LongType); see object doc for semantics.
    *
    * @param idCol     unique tiebreak id (quality ties order by it)
    * @param tokenCol  per-row token count (summed into the budget)
    * @param budget    inclusive cumulative-token ceiling
    */
  def selectByTokenBudget(df: DataFrame, idCol: String, qualityCol: String,
                          tokenCol: String, budget: Long,
                          cumCol: String = "cum_tokens",
                          maxQualityKeys: Int = 100000): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val clash = df.columns.toSet.intersect(Set("__q", "__prefix", cumCol))
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with selectByTokenBudget's names")
    val spark = df.sparkSession
    // the scored projection is read twice (totals pass + selection
    // pass) — persist it so the quality/token expressions evaluate
    // once; it is the NARROW (id, quality, tokens) frame, not the
    // corpus text, so this is the "persist the scored projection"
    // production shape, not a corpus cache
    val eligible = df.filter(col(qualityCol).isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // 1. narrow per-quality totals (key domain = score granularity).
    //    The collect is bounded by maxQualityKeys and FAILS FAST past
    //    it (the SpanDedup.fitSpanIndex/maskContaminatedSpans guard
    //    convention): a non-quantized score column — raw model logits
    //    — would otherwise collect one row per document and OOM the
    //    driver. Quantize the score first (the 3-decimal qualityScore
    //    has ≤1001 keys) or raise the bound deliberately.
    val totals: Array[(Double, Long)] = eligible
      .groupBy(col(qualityCol).cast(DoubleType).as("__q"))
      .agg(sum(col(tokenCol).cast(LongType)).as("__qtot"))
      .take(maxQualityKeys + 1)
      .map(r => (r.getDouble(0), r.getLong(1)))
    require(totals.length <= maxQualityKeys,
      s"quality domain exceeds maxQualityKeys=$maxQualityKeys — the score " +
        "column is not quantized; quantize it (e.g. round to 3 decimals) " +
        "before budget selection")
    // 2. driver prefix sums, highest quality first
    val sorted = totals.sortBy(-_._1)
    val prefixes = sorted.scanLeft(0L)(_ + _._2).init
    val prefixRows = sorted.zip(prefixes).map { case ((q, _), p) =>
      Row(q, p)
    }
    val prefixDf = spark.createDataFrame(
      spark.sparkContext.parallelize(prefixRows.toSeq, 1),
      StructType(Seq(StructField("__q", DoubleType, nullable = false),
        StructField("__prefix", LongType, nullable = false))))
    // 3. distributed within-quality running sums + map-side prefix join.
    //    The join key is the exact double produced by the same column
    //    expression on both sides, so equality is bit-stable.
    val w = Window.partitionBy(col(qualityCol)).orderBy(col(idCol).asc)
    // the kept set is budget-bounded (≤ budget tokens, plus any
    // zero-token rows at the cut), so the eager localCheckpoint that
    // lets the persisted projection release immediately is safe —
    // same contract as Dedup's verified-pairs checkpoint
    val out = eligible
      .join(broadcast(prefixDf),
        col(qualityCol).cast(DoubleType) === col("__q"))
      .withColumn(cumCol,
        (col("__prefix") + sum(col(tokenCol).cast(LongType)).over(w))
          .cast(LongType))
      .where(col(cumCol) <= budget)
      .drop("__q", "__prefix")
      .localCheckpoint(true)
    eligible.unpersist()
    out
  }
}
