package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.collection.mutable

/**
 * Multi-pattern blocklist scanning with a real Aho–Corasick automaton
 * — the content-filtering kernel of a training-data pipeline (bad-word
 * lists, leaked-secret markers, boilerplate signatures). Extension
 * surface (no reference counterpart).
 *
 * Why AC and not `contains` per pattern: one pass over each document
 * finds ALL occurrences of ALL patterns (overlapping included), so
 * cost is O(|text| + matches) regardless of blocklist size — a
 * 10k-entry blocklist costs the same scan as a 4-entry one. The
 * automaton is built once on the driver (blocklist-sized) and rides
 * the task closure; the scan itself is MAP-ONLY — nothing shuffles.
 */
object Blocklist {

  /** Aho–Corasick automaton over lowercased patterns. Counts every
    * occurrence of every pattern, overlapping matches included
    * ("aa" occurs twice in "aaa"). */
  final class AhoCorasick(patternsIn: Seq[String]) extends Serializable {
    private val patterns = patternsIn.map(_.toLowerCase)
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
      "patterns must be non-empty")

    // trie arrays: per-node char->child map, fail link, and the
    // pattern ids ending at the node (directly, not via suffix)
    private val children = mutable.ArrayBuffer(mutable.Map.empty[Char, Int])
    private val ends = mutable.ArrayBuffer(List.empty[Int])
    patterns.zipWithIndex.foreach { case (p, id) =>
      var node = 0
      p.foreach { c =>
        node = children(node).getOrElseUpdate(c, {
          children += mutable.Map.empty[Char, Int]
          ends += Nil
          children.length - 1
        })
      }
      ends(node) ::= id
    }
    private val fail = new Array[Int](children.length)
    // per-node cumulative stats through the fail chain, precomputed so
    // the scan never walks suffix links: total patterns ending here,
    // and the bitmask of which
    private val outCount = new Array[Int](children.length)
    private val maskWords = (patterns.length + 63) / 64
    private val outMask = Array.ofDim[Long](children.length, maskWords)
    locally {
      val queue = mutable.Queue.empty[Int]
      def addEnds(node: Int, ids: List[Int]): Unit = ids.foreach { id =>
        outCount(node) += 1
        outMask(node)(id >> 6) |= 1L << (id & 63)
      }
      addEnds(0, ends(0))
      for ((_, c) <- children(0)) { fail(c) = 0; queue += c }
      children.head.foreach { case (_, c) => addEnds(c, ends(c)) }
      while (queue.nonEmpty) {
        val u = queue.dequeue()
        // fold the fail target's cumulative stats into u
        outCount(u) += outCount(fail(u))
        var w = 0
        while (w < maskWords) {
          outMask(u)(w) |= outMask(fail(u))(w); w += 1
        }
        for ((ch, v) <- children(u)) {
          var f = fail(u)
          while (f != 0 && !children(f).contains(ch)) f = fail(f)
          fail(v) = children(f).getOrElse(ch, 0) match {
            case `v` => 0 // child of root transitioning to itself
            case t   => t
          }
          addEnds(v, ends(v))
          queue += v
        }
      }
    }

    /** (total occurrences, distinct patterns hit) in one pass. */
    def scan(text: String): (Long, Int) = {
      if (text == null) return (0L, 0)
      val t = text.toLowerCase
      var node = 0
      var total = 0L
      val hit = new Array[Long](maskWords)
      var i = 0
      while (i < t.length) {
        val c = t.charAt(i)
        while (node != 0 && !children(node).contains(c)) node = fail(node)
        node = children(node).getOrElse(c, 0)
        if (outCount(node) > 0) {
          total += outCount(node)
          var w = 0
          while (w < maskWords) { hit(w) |= outMask(node)(w); w += 1 }
        }
        i += 1
      }
      (total, hit.map(java.lang.Long.bitCount).sum)
    }
  }

  /** Annotate each document with its blocklist exposure: total match
    * count (overlapping), distinct patterns hit, and a flag. Map-only;
    * the automaton rides the closure. */
  def annotate(docs: DataFrame, idCol: String, textCol: String,
               patterns: Seq[String]): DataFrame = {
    val ac = new AhoCorasick(patterns)
    val scanUdf = udf((s: String) => ac.scan(s))
    docs.select(col(idCol), scanUdf(col(textCol)).as("__s"))
      .select(col(idCol),
        col("__s._1").as("n_hits"),
        col("__s._2").as("n_patterns_hit"),
        (col("__s._1") > 0).as("flagged"))
  }
}
