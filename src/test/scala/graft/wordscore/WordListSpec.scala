package graft.wordscore

import org.scalatest.funsuite.AnyFunSuite

/**
 * Word-list pins from the reference's WordListTests
 * (`/root/reference/src/test/scala-2.11/ch/uzh/sentiment/utils/WordListTests.scala:11-29`)
 * plus fuzzy/merge semantics checks.
 */
class WordListSpec extends AnyFunSuite {

  test("positive pins: nice=1, happy=1 (reference WordListTests)") {
    assert(WordList.value("nice") === 1.0)
    assert(WordList.value("happy") === 1.0)
  }

  test("negative pins: bad=-1, badly=-1 (reference WordListTests)") {
    assert(WordList.value("bad") === -1.0)
    assert(WordList.value("badly") === -1.0)
  }

  test("dictionary sizes match the bundled resources") {
    // 3492: the resource has no trailing newline, so `wc -l` reports 3491
    assert(WordList.positive.length === 3492)
    assert(WordList.negative.length === 7604)
    // stem-merge shrinks the union
    assert(WordList.scores.size < 3492 + 7604)
  }

  test("stem collisions average (pos+neg stem -> mean)") {
    // every score is in [-1, 1] and collisions give intermediate values
    assert(WordList.scores.values.forall(v => v >= -1.0 && v <= 1.0))
  }

  test("char-dedup fallback: elongated forms resolve") {
    // "noooo".distinct == "no"; "no" itself is not in the Hu&Liu lists,
    // so this exercises dedup+fuzzy, and must stay within [-1, 1]
    val v = WordList.value("noooo")
    assert(v >= -1.0 && v <= 1.0)
  }

  test("fuzzy: a near-miss of a strongly-scored word picks up its sign") {
    // "fantastiq" is distance 1 from stem "fantast" family; just pin range
    // and determinism rather than a specific dictionary-dependent value
    val v1 = WordList.fuzzy("excellentt")
    val v2 = WordList.fuzzy("excellentt")
    assert(v1 === v2)
    assert(v1 >= -1.0 && v1 <= 1.0)
  }

  test("fuzzy: tokens >3 edits from every dictionary entry score 0") {
    assert(WordList.fuzzy("qqqqqqqqqqqqqqqqqqqqqq") === 0.0)
  }

  test("fuzzy memo LRU: bounded at cap without full eviction") {
    // the memo behind WordList.fuzzy; small instance so overflowing it
    // doesn't need 2^17 Levenshtein scans
    val c = new BoundedLruCache[String, java.lang.Integer](64, stripes = 4)
    for (i <- 0 until 256) c.put(s"k$i", i)
    assert(c.size <= 64)          // bounded
    assert(c.size > 32)           // ...but NOT cleared wholesale on cap
    // recency: a key touched while inserts continue survives the churn
    c.put("hot", -1)
    for (i <- 1000 until 1014) { c.put(s"k$i", i); assert(c.get("hot") === -1) }
    assert(c.get("hot") === -1)
    // and cold keys from the first wave were evicted, not retained
    assert((0 until 64).count(i => c.get(s"k$i") != null) < 64)
  }
}
