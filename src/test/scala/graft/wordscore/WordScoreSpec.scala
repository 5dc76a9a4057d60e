package graft.wordscore

import org.scalatest.funsuite.AnyFunSuite

/**
 * Scoring-arithmetic pins for the reference's `PlainTextAnalyser`
 * semantics (`/root/reference/.../PlainTextAnalyser.scala:12-39`):
 * value = sum(score)/#nonzero per token set; text score = mean of raw
 * and stemmed evaluations when both defined.
 */
class WordScoreSpec extends AnyFunSuite {

  test("single positive word scores 1") {
    // "nice": raw value 1 (stem "nice"->"nice"), stemmed pass identical
    assert(WordScore.computeSentiment("nice") === 1.0)
  }

  test("single negative word scores -1") {
    assert(WordScore.computeSentiment("bad") === -1.0)
  }

  test("balanced text averages toward 0") {
    val v = WordScore.computeSentiment("nice bad")
    assert(math.abs(v) < 0.5, s"got $v")
  }

  test("score is always within [-1, 1]") {
    for (t <- Seq("great awesome lovely", "horrible awful terrible",
      "the of and a", "spark scala data engine"))
      assert(math.abs(WordScore.computeSentiment(t)) <= 1.0, s"text: $t")
  }

  test("null and empty are safe") {
    assert(WordScore.computeSentiment(null) === 0.0)
    val v = WordScore.computeSentiment("")
    assert(v >= -1.0 && v <= 1.0)
  }

  test("deterministic across calls") {
    val t = "happy happy joy joy badly done"
    assert(WordScore.computeSentiment(t) === WordScore.computeSentiment(t))
  }
}
