package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/**
 * EXACT heavy hitters with bounded state — "which values exceed φ of
 * all occurrences?" (stopword discovery, hot-domain detection, skew-key
 * census) computed WITHOUT a full-cardinality hash aggregate:
 *
 *   pass 1 — a mergeable Misra–Gries summary (k = ⌈1/φ⌉ counters) as a
 *     `TypedImperativeAggregate` UDAF: per-partition update, O(k)
 *     buffer merge at the exchange — the classic guarantee that every
 *     value with true frequency > n/(k+1) survives as a candidate, so
 *     the candidate set (≤ k values, bounded driver read) is a SUPERSET
 *     of the φ-heavy values;
 *   pass 2 — exact counts of the candidates only (the `isin` filter
 *     prunes map-side; the aggregate's key domain is ≤ k), thresholded
 *     at > φ·n.
 *
 * The output is therefore EXACT and deterministic — identical to the
 * full `GROUP BY value HAVING count > φ·n` an oracle replays — while
 * the state at any point is O(k), not O(distinct values): at 100 TB a
 * token census has billions of distinct keys, a Misra–Gries buffer has
 * a few hundred. The MG buffer's internal counts are order-dependent
 * (classic), but they never reach the output: only the candidate SET
 * does, and the superset guarantee is order-free.
 */
object Frequent {

  /** Mergeable Misra–Gries frequent-items summary over strings: at
    * most k counters; decrement-on-overflow update, subtract-(k+1)th-
    * largest merge (Agarwal et al., mergeable summaries). Output is
    * the SORTED candidate value set. Null inputs are ignored. */
  final class MisraGries(k: Int)
      extends Aggregator[String, java.util.HashMap[String, Long], Seq[String]] {
    require(k >= 1, "k must be >= 1")

    override def zero: java.util.HashMap[String, Long] =
      new java.util.HashMap[String, Long]()

    override def reduce(buf: java.util.HashMap[String, Long],
                        v: String): java.util.HashMap[String, Long] = {
      if (v != null) {
        val cur = buf.get(v)
        if (cur != 0L || buf.containsKey(v)) buf.put(v, cur + 1L)
        else if (buf.size < k) buf.put(v, 1L)
        else {
          // decrement every counter; drop the ones that hit zero —
          // the arriving value is "cancelled" against k others
          val it = buf.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            if (e.getValue <= 1L) it.remove()
            else e.setValue(e.getValue - 1L)
          }
        }
      }
      buf
    }

    override def merge(a: java.util.HashMap[String, Long],
                       b: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
      val itb = b.entrySet().iterator()
      while (itb.hasNext) {
        val e = itb.next()
        val cur = a.get(e.getKey)
        a.put(e.getKey, cur + e.getValue)
      }
      if (a.size > k) {
        // subtract the (k+1)-th largest count from everything; at most
        // k counts can exceed it, so the survivor set fits in k
        val counts = new Array[Long](a.size)
        var i = 0
        val itc = a.values().iterator()
        while (itc.hasNext) { counts(i) = itc.next(); i += 1 }
        java.util.Arrays.sort(counts)
        val m = counts(a.size - k - 1) // (k+1)-th largest
        val ita = a.entrySet().iterator()
        while (ita.hasNext) {
          val e = ita.next()
          if (e.getValue <= m) ita.remove()
          else e.setValue(e.getValue - m)
        }
      }
      a
    }

    override def finish(buf: java.util.HashMap[String, Long]): Seq[String] = {
      val out = new Array[String](buf.size)
      val it = buf.keySet().iterator()
      var i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      java.util.Arrays.sort(out.asInstanceOf[Array[AnyRef]])
      scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
    }

    override def bufferEncoder: Encoder[java.util.HashMap[String, Long]] =
      Encoders.kryo[java.util.HashMap[String, Long]]

    override def outputEncoder: Encoder[Seq[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
  }

  /** The Misra–Gries candidate set as an aggregate Column. */
  def candidatesAgg(valueCol: Column, k: Int): Column =
    udaf(new MisraGries(k)).apply(valueCol)

  /**
   * Values of `valueCol` occurring MORE than `phi` of all non-null
   * occurrences, with their exact counts — (value, n_occurrences)
   * ordered by count desc then value. Exact by the two-pass
   * construction; `n` (the denominator) is the non-null occurrence
   * count, and the threshold compare `count > phi * n` is a single
   * double multiply both engines evaluate identically.
   */
  def heavyHitters(df: DataFrame, valueCol: String,
                   phi: Double): DataFrame = {
    require(phi > 0.0 && phi < 1.0, "phi must be in (0, 1)")
    val k = math.ceil(1.0 / phi).toInt
    // ONE job for candidates + total: the MG aggregate and the count
    // ride the same partial/final global aggregate
    val head = df.where(col(valueCol).isNotNull)
      .agg(candidatesAgg(col(valueCol), k).as("cand"),
        count(lit(1)).as("n")).head()
    val cand: Seq[String] = head.getSeq[String](0)
    val n = head.getLong(1)
    df.where(col(valueCol).isin(cand: _*))
      .groupBy(col(valueCol))
      .agg(count(lit(1)).as("n_occurrences"))
      .where(col("n_occurrences") > lit(phi) * lit(n))
      .orderBy(col("n_occurrences").desc, col(valueCol).asc)
  }
}
