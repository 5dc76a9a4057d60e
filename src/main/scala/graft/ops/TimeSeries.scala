package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an irregular event stream onto
  * a fixed per-key grid and forward-fill the gaps.
  *
  * Scale shape (100 TB): the corpus-sized work is ONE hash aggregate —
  * raw events shrink to (key, slot) rows map-side before the only
  * data-sized shuffle. Everything after operates on the aggregated
  * grid (keys x slots, metadata-sized next to the stream): the dense
  * grid is synthesized per key with `sequence`/`explode` (one row per
  * key expands to its slot range — no corpus re-scan), the fill is a
  * `last(_, ignoreNulls)` window partitioned BY KEY (never a global
  * window), and the grid join is a key+slot equi-join between two
  * aggregated frames. Leading slots before a key's first observation
  * are not emitted (each key's grid starts at its own first slot), so
  * the fill value is always defined.
  */
object TimeSeries {

  /**
   * Population Stability Index time series — the categorical-drift
   * monitor release gates run per period: for each period (default
   * daily), `psi = Σ_cat (p − q)·ln(p/q)` between this period's and
   * the PREVIOUS period's category shares, add-one smoothed over the
   * GLOBAL category domain (so a category absent one period
   * contributes its smoothed floor instead of tearing a hole in the
   * sum; p = (n+1)/(N+C)). Complements the two-corpus KL drift
   * ([[Profile]]'s unigram form) and the fixed-reference mix drift
   * ([[graft.streaming.EventStreams.typeMixDrift]]) with the
   * consecutive-period form that catches WHEN a shift happened.
   * Standard alert bands: psi < 0.1 stable, 0.1–0.25 moderate,
   * > 0.25 investigate.
   *
   * Scale shape: the corpus-sized work is ONE (period, category) hash
   * aggregate (partial map-side); everything after — the tiny
   * period×category grid (synthesized by a broadcast cross join),
   * the adjacent-period self-join, the per-period sum — is
   * metadata-sized. The category domain is CHECKED (`maxCategories`,
   * loud failure), not assumed: a high-cardinality column here means
   * someone pointed the monitor at the wrong field.
   *
   * Output: (period, n_events, psi) for every period with a
   * predecessor, ordered by period; `period` = floor(epoch_seconds /
   * stepSeconds); psi rounds to 6 (its smoothed terms are exact
   * integer ratios, so only the final libm-log sum needs a boundary).
   */
  def psiByPeriod(df: DataFrame, tsCol: String, catCol: String,
                  stepSeconds: Long = 86400L,
                  maxCategories: Int = 10000): DataFrame = {
    require(stepSeconds > 0, "stepSeconds must be positive")
    val clash = df.columns.toSet.intersect(Set(
      "__pd", "__cat", "__n", "__N", "__p2", "__c2", "__n2", "__p",
      "__q", "__gcat", "__tpd", "__tpd2", "__ppd", "__pcat",
      "period", "n_events", "psi"))
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with psiByPeriod's names")
    val counts = df
      .where(col(tsCol).isNotNull && col(catCol).isNotNull)
      .groupBy(
        floor(unix_micros(col(tsCol)) / lit(stepSeconds * 1000000L))
          .as("__pd"),
        col(catCol).as("__cat"))
      .agg(count(lit(1)).as("__n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // every frame below derives from `counts`, so each join side
    // renames its columns uniquely — self-join name resolution over a
    // shared lineage is ambiguous otherwise
    val cats = counts.select(col("__cat").as("__gcat")).distinct()
    val nCats = cats.count()
    require(nCats <= maxCategories,
      s"$nCats categories exceed maxCategories=$maxCategories — " +
        s"'$catCol' is not a categorical column")
    val totals = counts.groupBy(col("__pd").as("__tpd"))
      .agg(sum(col("__n")).as("__N"))
    val cnt = counts.select(col("__pd").as("__p2"),
      col("__cat").as("__c2"), col("__n").as("__n2"))
    // dense (period, category) shares over the GLOBAL domain
    val shares = totals.crossJoin(broadcast(cats))
      .join(cnt,
        col("__tpd") === col("__p2") && col("__gcat") === col("__c2"),
        "left")
      .select(col("__tpd").as("__pd"), col("__gcat").as("__cat"),
        ((coalesce(col("__n2"), lit(0L)) + lit(1L)).cast("double") /
          (col("__N") + lit(nCats)).cast("double")).as("__p"))
    val prev = shares.select((col("__pd") + 1).as("__ppd"),
      col("__cat").as("__pcat"), col("__p").as("__q"))
    val out = shares.join(prev,
        col("__pd") === col("__ppd") && col("__cat") === col("__pcat"))
      .groupBy(col("__pd"))
      .agg(round(sum((col("__p") - col("__q")) *
        log(col("__p") / col("__q"))), 6).as("psi"))
      .join(totals.select(col("__tpd").as("__tpd2"), col("__N")),
        col("__pd") === col("__tpd2"))
      .select(col("__pd").as("period"), col("__N").as("n_events"),
        col("psi"))
      .orderBy("period")
      .localCheckpoint(true)
    counts.unpersist()
    out
  }

  /** Dense per-key grid at `stepSeconds` resolution with gaps
    * forward-filled from the last observed slot aggregate.
    *
    * Output: (key, slot, n_obs, value_filled, was_gap) where `slot` is
    * the epoch-second bucket index `floor(epoch(ts) / stepSeconds)`,
    * `n_obs` counts raw events in the slot (0 for synthesized slots),
    * `value_filled` is `round(sum(valCol), 2)` carried forward across
    * gaps, and `was_gap` marks synthesized slots.
    *
    * `tsCol` must be TIMESTAMP (callers read fixtures through
    * [[graft.streaming.EventStreams.nanosToTimestamp]]).
    */
  def gapFill(events: DataFrame, keyCol: String, tsCol: String,
              valCol: String, stepSeconds: Long = 3600L): DataFrame = {
    require(stepSeconds > 0, s"stepSeconds must be positive: $stepSeconds")
    val slot: Column =
      floor(unix_micros(col(tsCol)) / lit(stepSeconds * 1000000L))
        .cast("long")
    // Persisted so the span derivation below reuses the aggregate
    // instead of re-scanning the raw stream: without the pin, Catalyst
    // rewrites the per-key min/max as a SECOND corpus scan. The
    // (key, slot) frame is grid-sized — cheap to hold.
    val obs = events
      .groupBy(col(keyCol), slot.as("slot"))
      .agg(count(lit(1)).as("n_obs"), sum(col(valCol)).as("__v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val grid = obs
      .groupBy(col(keyCol))
      .agg(min("slot").as("__lo"), max("slot").as("__hi"))
      .select(col(keyCol),
        explode(sequence(col("__lo"), col("__hi"))).as("slot"))
    val fillW = Window.partitionBy(keyCol).orderBy("slot")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .join(obs, Seq(keyCol, "slot"), "left")
      .select(
        col(keyCol),
        col("slot"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        round(last(col("__v"), ignoreNulls = true).over(fillW), 2)
          .as("value_filled"),
        col("n_obs").isNull.as("was_gap"))
  }
}
