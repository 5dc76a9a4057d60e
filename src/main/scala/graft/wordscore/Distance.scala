package graft.wordscore

/**
 * Levenshtein edit distance.
 *
 * Capability parity with the reference's `Helper.stringDistance`
 * (`/root/reference/src/main/scala-2.11/ch/uzh/sentiment/utils/Helper.scala:149-163`),
 * which is a memoized recursive formulation. This is a from-scratch
 * iterative two-row DP with an early-exit bound — O(min-len) memory, no
 * per-call map allocation — because it runs inside the hot word-score
 * UDF on every out-of-vocabulary token.
 */
object Distance {

  /** Exact Levenshtein distance (insert/delete/substitute all cost 1). */
  def levenshtein(s1: String, s2: String): Int =
    bounded(s1, s2, Int.MaxValue - 1)

  /**
   * Distance if it is <= `max`, else some value > `max` (early exit).
   * The band bound makes the fuzzy dictionary scan viable at scale: for
   * the d<=3 lookup we stop a row as soon as its minimum exceeds 3.
   */
  def bounded(s1: String, s2: String, max: Int): Int = {
    if (s1 == s2) return 0
    val (a, b) = if (s1.length <= s2.length) (s1, s2) else (s2, s1)
    val la = a.length
    val lb = b.length
    if (lb - la > max) return max + 1
    if (la == 0) return lb
    var prev = new Array[Int](la + 1)
    var curr = new Array[Int](la + 1)
    var i = 0
    while (i <= la) { prev(i) = i; i += 1 }
    var j = 1
    while (j <= lb) {
      curr(0) = j
      var rowMin = j
      val cb = b.charAt(j - 1)
      i = 1
      while (i <= la) {
        val cost = if (a.charAt(i - 1) == cb) 0 else 1
        var v = math.min(prev(i) + 1, curr(i - 1) + 1)
        val sub = prev(i - 1) + cost
        if (sub < v) v = sub
        curr(i) = v
        if (v < rowMin) rowMin = v
        i += 1
      }
      if (rowMin > max) return max + 1
      val tmp = prev; prev = curr; curr = tmp
      j += 1
    }
    prev(la)
  }
}
