package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of (point-in-time) join — an operator Spark lacks natively, core
 * to training-data pipelines: attach to each left row the most recent
 * right-side value with the same key at or before the left row's
 * ordering value (feature lookups, slowly-changing dimensions, "last
 * known state at event time").
 *
 * Scale shape: the naive formulation is a range join (`l.ts >= r.ts`
 * theta-join), which Spark executes as a per-key cartesian — quadratic
 * in events per key. This implementation instead UNIONS the two sides,
 * sorts once per key (one hash shuffle on the key, the window sort is
 * spill-backed), and takes a running `last(payload, ignoreNulls)` over
 * the merged stream, so cost is O(n log n) per key and the plan has
 * exactly one exchange. Right rows sort before left rows at equal
 * ordering values, making the match inclusive (`>=`), same as DuckDB's
 * ASOF JOIN.
 *
 * Determinism: multiple right rows at the same (key, ord) are reduced
 * to one by `max(payload)` before the merge (document the reduction,
 * don't inherit partition order).
 */
object AsofJoin {

  /**
   * For every row of `left`, the latest `payloadCol` from `right` with
   * the same `keyCol` and `ordCol` <= the left row's (null when no
   * such row). Output = left columns + `outCol`.
   */
  def asof(left: DataFrame, right: DataFrame, keyCol: String,
           ordCol: String, payloadCol: String, outCol: String): DataFrame = {
    require(!left.columns.contains(outCol),
      s"output column $outCol already exists on the left side")
    // reserved merge-marker temp names: a caller column named __p/__r
    // would be overwritten and corrupt the running-last merge
    val clash = (left.columns ++ right.columns).toSet
      .intersect(Set("__p", "__r"))
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with AsofJoin's reserved temp names")
    val payloadType = right.schema(payloadCol).dataType
    // one row per (key, ord) on the right: deterministic max reduction
    val r = right.groupBy(col(keyCol), col(ordCol))
      .agg(max(col(payloadCol)).as("__p"))
      .withColumn("__r", lit(1))
    val l = left
      .withColumn("__p", lit(null).cast(payloadType))
      .withColumn("__r", lit(0))
    // merged stream: right rows first at equal ord (inclusive >=)
    val merged = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(ordCol).asc, col("__r").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    merged
      .withColumn(outCol, last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__r") === 0)
      .drop("__p", "__r")
  }

  /**
   * [[asof]] with a STALENESS BOUND: the match only counts when the
   * right row's ordering value is within `tolerance` of the left
   * row's (`left.ord - right.ord <= tolerance`), else null — the
   * "don't enrich from a dimension older than X" guard every
   * point-in-time feature lookup eventually needs (an unbounded as-of
   * happily attaches a year-old price to today's trade). `ordCol`
   * must be numeric (e.g. epoch micros) so the staleness subtraction
   * is well-defined; same one-shuffle union + running-last shape as
   * [[asof]], with the matched ordering value carried through the
   * merge inside a (ord, payload) struct.
   */
  def asofWithin(left: DataFrame, right: DataFrame, keyCol: String,
                 ordCol: String, payloadCol: String, outCol: String,
                 tolerance: Long): DataFrame = {
    require(tolerance >= 0, "staleness tolerance must be non-negative")
    require(!left.columns.contains(outCol),
      s"output column $outCol already exists on the left side")
    val clash = (left.columns ++ right.columns).toSet
      .intersect(Set("__p", "__r", "__last"))
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with AsofJoin's reserved temp names")
    val ordType = right.schema(ordCol).dataType
    require(ordType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"asofWithin needs a numeric ordCol (got $ordType) — pass epoch micros for timestamps")
    // BOTH sides: a left ordCol of a different (or non-numeric) type
    // would pass a right-only check and then either fail late inside
    // unionByName or coerce silently, making the staleness
    // subtraction's type (and its overflow/precision behavior) depend
    // on which side happened to widen
    val leftOrdType = left.schema(ordCol).dataType
    require(leftOrdType == ordType,
      s"asofWithin needs the same numeric ordCol type on both sides " +
        s"(left: $leftOrdType, right: $ordType)")
    val payloadType = right.schema(payloadCol).dataType
    val structType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("o", ordType),
      org.apache.spark.sql.types.StructField("v", payloadType)))
    val r = right.groupBy(col(keyCol), col(ordCol))
      .agg(max(col(payloadCol)).as("__pv"))
      .select(col(keyCol), col(ordCol),
        struct(col(ordCol).as("o"), col("__pv").as("v")).as("__p"))
      .withColumn("__r", lit(1))
    val l = left
      .withColumn("__p", lit(null).cast(structType))
      .withColumn("__r", lit(0))
    val merged = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(ordCol).asc, col("__r").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    merged
      .withColumn("__last", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__r") === 0)
      .withColumn(outCol,
        when(col("__last").isNotNull &&
          col(ordCol) - col("__last.o") <= tolerance, col("__last.v")))
      .drop("__p", "__r", "__last")
  }
}
