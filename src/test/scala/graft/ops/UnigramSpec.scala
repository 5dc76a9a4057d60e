package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Unigram-LM tokenizer trainer ([[Unigram]]): hand-worked Viterbi-EM
  * example (the BpeSpec pattern), segmentation totality, determinism,
  * and the apply-time report shape. */
class UnigramSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("hand-worked fixture: EM concentrates on whole-word pieces, pruning keeps them") {
    // census: abab x3, cd x2. Seed substrings (maxPieceLen=4) weighted
    // by word freq: a:6 b:6 ab:6 / aba:3 ba:3 bab:3 abab:3 / c:2 d:2
    // cd:2. Under the seed model, Viterbi("abab") compares
    // [abab]=3/36 against [ab,ab]=36/36^2=1/36 and [a,bab]=[aba,b]
    // =18/36^2 — the whole word wins; same for [cd] vs [c,d]. So EM
    // counts collapse to {abab:3, cd:2} and iterative pruning must
    // keep exactly those two multi-char pieces at vocabSize=6
    // (4 chars + 2).
    val docs = Seq("abab abab cd", "abab cd").toDF("text")
    val vocab = Unigram.learnVocab(docs, "text", vocabSize = 6,
      maxPieceLen = 4, seedSize = 10)
    assert(vocab.map(_.piece).toSet === Set("a", "b", "c", "d", "abab", "cd"))
    // sorted by (count desc, piece asc); zero-count chars trail
    assert(vocab.take(2).map(p => (p.piece, p.count))
      === Seq(("abab", 3L), ("cd", 2L)))
    assert(vocab.drop(2).map(_.piece) === Seq("a", "b", "c", "d"))
    assert(vocab.drop(2).forall(_.count === 0L))
    // fitted logprobs: used pieces log(c/total); floor strictly below
    val byPiece = vocab.map(p => p.piece -> p.logprob).toMap
    assert(math.abs(byPiece("abab") - math.log(3.0 / 5.0)) < 1e-12)
    assert(math.abs(byPiece("cd") - math.log(2.0 / 5.0)) < 1e-12)
    assert(byPiece("a") < byPiece("cd"))

    // application: whole words segment as single pieces
    val toks = Unigram.tokenize(
      Seq((1L, "abab cd abab"), (2L, ""), (3L, null: String))
        .toDF("id", "text"), "id", "text", vocab)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(toks === Map(1L -> 3, 2L -> 0, 3L -> 0))
  }

  test("viterbi: longest-piece tie rule, totality via the unk fallback, reconstruction") {
    val scores = Map("a" -> math.log(0.25), "b" -> math.log(0.25),
      "ab" -> math.log(0.0625)) // log(ab) == log(a)+log(b): a TIE
    // tie resolves to the LONGEST piece at the boundary
    assert(Unigram.viterbi("ab", scores, 4).toSeq === Seq("ab"))
    // unseen chars segment as single-char unk pieces — total, and
    // they never displace known pieces
    assert(Unigram.viterbi("axb", scores, 4).toSeq === Seq("a", "x", "b"))
    assert(Unigram.viterbi("", scores, 4).toSeq === Seq.empty)
    // reconstruction: concatenation always rebuilds the word
    for (w <- Seq("abababa", "bbbb", "aXbXa", "zzz"))
      assert(Unigram.viterbi(w, scores, 4).mkString === w)
  }

  test("learnVocab is deterministic across partitionings and respects the char floor") {
    val texts = (0 until 50).map(i =>
      s"token${i % 7} shared shared word${i % 3} unigram unigram unigram")
    val d1 = texts.toDF("text").repartition(1)
    val d8 = texts.toDF("text").repartition(8)
    val v1 = Unigram.learnVocab(d1, "text", vocabSize = 20,
      maxPieceLen = 5, seedSize = 40, emIters = 2)
    val v8 = Unigram.learnVocab(d8, "text", vocabSize = 20,
      maxPieceLen = 5, seedSize = 40, emIters = 2)
    assert(v1 === v8) // counts, logprobs, and order all identical
    // a vocabSize below the character count stops at the char floor
    val tiny = Unigram.learnVocab(d1, "text", vocabSize = 1,
      maxPieceLen = 3, seedSize = 30)
    assert(tiny.map(_.piece).forall(_.length == 1))
    assert(tiny.nonEmpty)
  }
}
