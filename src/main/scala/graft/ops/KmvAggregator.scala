package graft.ops

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/**
 * KMV sketch as a TRUE aggregate function — the mergeable form of
 * [[Sketch.kmvState]]: buffer = the group's k smallest DISTINCT hash
 * fractions, updated per input row and MERGED across partial
 * aggregates, so a grouped sketch is ONE hash-aggregate pass (partial
 * map-side, final after the group exchange) with O(k) state per group
 * — no distinct pre-pass, no rank window — and it composes with
 * rollup/cube/grouping-sets, which a window-rank formulation cannot.
 *
 * Output equals [[Sketch.kmvState]]'s array bit-for-bit (same 60-bit
 * md5 hash via [[Sketch.hashFraction]], same k-smallest-distinct
 * rule), so the persisted-state / [[Sketch.kmvMergeStates]] /
 * [[Sketch.estimateFrom]] contract is shared between the two forms —
 * pinned by OpsSpec and the q151 oracle row.
 *
 * Under the hood `functions.udaf` wraps this in Spark's
 * `ScalaAggregator`, a `TypedImperativeAggregate`: the TreeSet buffer
 * lives as a JVM object inside the hash map and serializes (kryo)
 * only at the partial/final exchange boundary.
 *
 * Trade-off vs the window form, stated: per-row TreeSet updates are a
 * (boxed) object path, outside WholeStageCodegen — the window form's
 * distinct+WindowGroupLimit stays codegen'd end-to-end and wins when
 * values repeat heavily (repeats collapse map-side before ranking).
 * The UDAF wins on composition (rollup) and on one-pass shape when
 * values are mostly unique. Both are kept deliberately.
 */
final class KmvAggregator(k: Int)
    extends Aggregator[java.lang.Double,
      java.util.TreeSet[java.lang.Double], Seq[Double]] {
  require(k >= 2, "k must be >= 2")

  override def zero: java.util.TreeSet[java.lang.Double] =
    new java.util.TreeSet[java.lang.Double]()

  private def insert(buf: java.util.TreeSet[java.lang.Double],
                     u: java.lang.Double): Unit =
    // skip values already above the current k-th smallest: the common
    // case once the buffer fills, one comparison instead of a tree op
    if (buf.size < k || u.doubleValue < buf.last.doubleValue) {
      buf.add(u)
      if (buf.size > k) buf.pollLast()
    }

  /** Null inputs are ignored — `count(DISTINCT)` semantics, matching
    * [[Sketch.kmvDistinct]]'s isNotNull pre-filter. */
  override def reduce(buf: java.util.TreeSet[java.lang.Double],
                      u: java.lang.Double): java.util.TreeSet[java.lang.Double] = {
    if (u != null) insert(buf, u)
    buf
  }

  override def merge(a: java.util.TreeSet[java.lang.Double],
                     b: java.util.TreeSet[java.lang.Double]): java.util.TreeSet[java.lang.Double] = {
    // b iterates ascending; once an element can't enter a, none after
    // it can — exact merge (k smallest of a union come from the
    // per-side k smallest), same invariant as kmvMergeStates
    val it = b.iterator()
    var open = true
    while (open && it.hasNext) {
      val u = it.next()
      if (a.size < k || u.doubleValue < a.last.doubleValue) insert(a, u)
      else open = false
    }
    a
  }

  override def finish(buf: java.util.TreeSet[java.lang.Double]): Seq[Double] = {
    val out = new Array[Double](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().doubleValue; i += 1 }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
  }

  override def bufferEncoder: Encoder[java.util.TreeSet[java.lang.Double]] =
    Encoders.kryo[java.util.TreeSet[java.lang.Double]]

  override def outputEncoder: Encoder[Seq[Double]] =
    ExpressionEncoder[Seq[Double]]()
}

object KmvAggregator {
  /** `kmvState(valueCol, k)` as an aggregate Column: apply inside any
    * `agg`/`rollup`/`cube`. Hashing happens OUTSIDE the aggregate (a
    * codegen'd projection feeding it), the aggregate sees only the
    * [0,1) fractions. */
  def kmvStateAgg(valueCol: Column, k: Int): Column =
    udaf(new KmvAggregator(k)).apply(Sketch.hashFraction(valueCol))
}
