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
