package graft.nlp

import org.scalatest.funsuite.AnyFunSuite

/** Pluggable NLP-backend contract pins (U5-U7 semantics from
  * `CoreNLPSentimentAnalyzer.scala:58-112`, offline backend). */
class SentimentBackendSpec extends AnyFunSuite {

  private val b = WordScoreBackend

  test("sentence split on terminal punctuation") {
    assert(b.sentences("Great day. Bad news! Ok?") ===
      Seq("Great day.", "Bad news!", "Ok?"))
    assert(b.sentences("") === Seq.empty)
    assert(b.sentences(null) === Seq.empty)
  }

  test("per-sentence classes are in 0..4") {
    for (s <- Seq("wonderful amazing great", "horrible awful bad", "neutral words here"))
      assert((0 to 4).contains(b.scoreSentence(s)))
  }

  test("positive sentence scores above negative sentence") {
    assert(b.scoreSentence("wonderful amazing great") >
      b.scoreSentence("horrible awful terrible"))
  }

  test("U5: computeSentiment takes the class of the LONGEST sentence") {
    // first sentence is longer -> its class wins
    val text = "this is a wonderfully happy long great sentence. bad."
    assert(b.computeSentiment(text) ===
      b.scoreSentence("this is a wonderfully happy long great sentence."))
  }

  test("U6: weighted sentiment is length-weighted mean, -1 when empty") {
    assert(b.computeWeightedSentiment("") === -1)
    val v = b.computeWeightedSentiment("great great great. awful.")
    assert(v >= 0 && v <= 4)
  }

  test("U7: lemmas filter length>2 and lowercase") {
    val out = b.textToLemmas("Dogs RUNNING so happily")
    assert(!out.split(" ").exists(_.length <= 2))
    assert(out === out.toLowerCase)
    assert(out.contains("dog")) // stemmed lemma
  }
}
