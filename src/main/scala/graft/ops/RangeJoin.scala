package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Bounded-interval range join — with [[AsofJoin]], the second
 * point-in-time operator Spark lacks natively: match each left row
 * with the right rows of the same key whose ordering value falls in
 * `[left.ord - window, left.ord)` (e.g. "all views in the 30 minutes
 * before this purchase" — attribution windows, feature aggregation
 * over trailing context).
 *
 * Scale shape: the naive `r.ts BETWEEN l.ts - w AND l.ts` theta-join
 * executes as a per-key cartesian (quadratic in rows per key). Here
 * both sides are bucketed into time bins of the window width; a right
 * row lands in exactly one bin, a left row probes its own bin and the
 * previous one (a window of width w spans at most two w-wide bins), so
 * the join is a narrow equi-join on (key, bin) with ~2x left fanout,
 * then the exact range predicate filters within buckets. This is the
 * standard interval-join shape in stream processors (Flink's interval
 * join state layout) — one shuffle, fanout bounded by bin population,
 * never all-pairs.
 */
object RangeJoin {

  /**
   * Pairs (left row, right row) for right rows of the same `keyCol`
   * with ord in `[l.ord - windowMicros, l.ord)`; `ordCol` must be a
   * timestamp. Right columns are suffixed `_r` on name collisions.
   */
  def pairsWithin(left: DataFrame, right: DataFrame, keyCol: String,
                  ordCol: String, windowMicros: Long): DataFrame = {
    require(windowMicros > 0, "windowMicros must be positive")
    // an input already carrying a reserved temp name would silently
    // join on the wrong bins — refuse instead
    val reserved = Set("__bin", "__lus")
    val clash = (left.columns ++ right.columns).toSet.intersect(reserved)
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with RangeJoin's reserved temp names")
    val lUs = unix_micros(col(ordCol))
    val collisions = right.columns.toSet.intersect(left.columns.toSet) - keyCol
    val r0 = collisions.foldLeft(right)((df, c) => df.withColumnRenamed(c, s"${c}_r"))
    val rOrd = if (collisions.contains(ordCol)) s"${ordCol}_r" else ordCol
    val rBinned = r0.withColumn("__bin", floor(unix_micros(col(rOrd)) / windowMicros))
    // left probes its bin and the previous one
    val lBinned = left
      .withColumn("__lus", lUs)
      .withColumn("__bin",
        explode(array(floor(lUs / windowMicros), floor(lUs / windowMicros) - 1)))
    lBinned.join(rBinned, Seq(keyCol, "__bin"))
      .where(unix_micros(col(rOrd)) >= col("__lus") - windowMicros &&
        unix_micros(col(rOrd)) < col("__lus"))
      .drop("__bin", "__lus")
  }
}
