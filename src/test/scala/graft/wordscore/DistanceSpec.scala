package graft.wordscore

import org.scalatest.funsuite.AnyFunSuite

/**
 * Levenshtein pins from the reference's HelperTests
 * (`/root/reference/src/test/scala-2.11/ch/uzh/sentiment/utils/HelperTests.scala:7-56`)
 * plus seeded randomized metric properties for the bounded variant.
 */
class DistanceSpec extends AnyFunSuite {

  import Distance.levenshtein

  test("empty strings") {
    assert(levenshtein("", "") === 0)
    assert(levenshtein("a", "") === 1)
    assert(levenshtein("", "a") === 1)
    assert(levenshtein("abc", "") === 3)
    assert(levenshtein("", "abc") === 3)
  }

  test("equal strings") {
    assert(levenshtein("a", "a") === 0)
    assert(levenshtein("abc", "abc") === 0)
  }

  test("inserts only") {
    assert(levenshtein("a", "ab") === 1)
    assert(levenshtein("b", "ab") === 1)
    assert(levenshtein("ac", "abc") === 1)
    assert(levenshtein("abcdefg", "xabxcdxxefxgx") === 6)
  }

  test("deletes only") {
    assert(levenshtein("ab", "a") === 1)
    assert(levenshtein("ab", "b") === 1)
    assert(levenshtein("abc", "ac") === 1)
    assert(levenshtein("xabxcdxxefxgx", "abcdefg") === 6)
  }

  test("substitutions only") {
    assert(levenshtein("a", "b") === 1)
    assert(levenshtein("ab", "ac") === 1)
    assert(levenshtein("ac", "bc") === 1)
    assert(levenshtein("abc", "axc") === 1)
    assert(levenshtein("xabxcdxxefxgx", "1ab2cd34ef5g6") === 6)
  }

  test("mixed operations") {
    assert(levenshtein("example", "samples") === 3)
    assert(levenshtein("sturgeon", "urgently") === 6)
    assert(levenshtein("distance", "difference") === 5)
  }

  test("tweet-grammar distances") {
    assert(levenshtein("noooo", "no") === 3)
    assert(levenshtein("great", "gr8t") === 2)
    assert(levenshtein("n00b", "noob") === 2)
  }

  private def randomPairs(n: Int): Seq[(String, String)] = {
    val rnd = new scala.util.Random(42)
    def word() = (0 until rnd.nextInt(12)).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString
    (0 until n).map(_ => (word(), word()))
  }

  test("property: symmetry and identity (500 seeded cases)") {
    for ((a, b) <- randomPairs(500)) {
      assert(levenshtein(a, b) === levenshtein(b, a), s"symmetry($a,$b)")
      assert(levenshtein(a, a) === 0)
    }
  }

  test("property: bounded agrees with exact within bound (500 seeded cases)") {
    for ((a, b) <- randomPairs(500)) {
      val d = levenshtein(a, b)
      val b2 = Distance.bounded(a, b, 2)
      if (d <= 2) assert(b2 === d, s"bounded($a,$b)")
      else assert(b2 > 2, s"bounded($a,$b) should exceed 2")
    }
  }

  test("property: distance bounded by max length (500 seeded cases)") {
    for ((a, b) <- randomPairs(500))
      assert(levenshtein(a, b) <= math.max(a.length, b.length))
  }
}
