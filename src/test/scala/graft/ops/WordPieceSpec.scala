package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** WordPiece: the likelihood merge criterion (hand-worked — a pair
  * must WIN on score while LOSING on raw frequency, the property that
  * separates it from BPE), the `##` continuation convention, BERT's
  * longest-match-first application, and the whole-word [UNK] rule. */
class WordPieceSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  test("symbols and merges carry the ## continuation convention") {
    assert(WordPiece.toSymbols("abc").toSeq === Seq("a", "##b", "##c"))
    assert(WordPiece.joinPair("a", "##b") === "ab")
    assert(WordPiece.joinPair("##b", "##c") === "##bc")
    assert(WordPiece.mergePair(Array("a", "##b", "##b", "##c"),
      "##b", "##c").toSeq === Seq("a", "##b", "##bc"))
  }

  test("likelihood criterion: rare-but-exclusive pair beats frequent pair") {
    // counts: a=100, ##b=10, ##x=90, q=3, ##z=3
    //   (q,##z): 3/(3*3)   = 0.3333  <- wins despite LOWEST frequency
    //   (a,##x): 90/(100*90) = 0.01  <- BPE's pick (highest count)
    //   (a,##b): 10/(100*10) = 0.01
    val words = Seq.fill(10)("ab") ++ Seq.fill(90)("ax") ++ Seq.fill(3)("qz")
    val docs = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val v = WordPiece.learnVocab(docs, "text", numMerges = 2,
      minPairCount = 2)
    assert(v.merges.map(_.piece) === Seq("qz", "ab"))
    val m1 = v.merges.head
    assert((m1.left, m1.right, m1.pairCount, m1.leftCount, m1.rightCount) ===
      (("q", "##z", 3L, 3L, 3L)))
    // round 2: (a,##b) and (a,##x) tie at exactly 1/100 — the total
    // (score desc, pair asc) order picks ##b deterministically
    val m2 = v.merges(1)
    assert((m2.left, m2.right, m2.pairCount) === (("a", "##b", 10L)))
    // alphabet: every census symbol, count-desc then symbol-asc
    assert(v.alphabet === Seq("a", "##x", "##b", "##z", "q"))
    // alphabetSize bounds the model for web-scale unicode
    assert(WordPiece.learnVocab(docs, "text", numMerges = 1,
      alphabetSize = 2).alphabet === Seq("a", "##x"))
  }

  test("encodeWord: longest-match-first, whole-word [UNK]") {
    val pieces = Set("un", "##aff", "##able", "##a", "u", "##n", "a")
    assert(WordPiece.encodeWord("unaffable", pieces).toSeq ===
      Seq("un", "##aff", "##able"))
    // longest match at position 0 is "un", not "u"
    assert(WordPiece.encodeWord("una", pieces).toSeq === Seq("un", "##a"))
    // any unmatchable step collapses the WHOLE word to [UNK]
    assert(WordPiece.encodeWord("unz", pieces).toSeq === Seq(WordPiece.Unk))
    assert(WordPiece.encodeWord("zebra", pieces).toSeq === Seq(WordPiece.Unk))
    assert(WordPiece.encodeWord("", pieces).toSeq === Seq.empty)
    // BERT's max_input_chars_per_word guard: a pathological token is
    // ONE [UNK] without paying the quadratic prefix walk
    assert(WordPiece.encodeWord("a" * 101, pieces ++ Set("a", "##a"))
      .toSeq === Seq(WordPiece.Unk))
  }

  test("tokenize: counts, unk accounting, deterministic digest, null text") {
    val words = Seq.fill(10)("ab") ++ Seq.fill(90)("ax") ++ Seq.fill(3)("qz")
    val docs = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val v = WordPiece.learnVocab(docs, "text", numMerges = 2)
    val out = WordPiece.tokenize(
      Seq((1L, "ab qz zzz"), (2L, null.asInstanceOf[String]))
        .toDF("doc_id", "text"), "doc_id", "text", v)
      .orderBy("doc_id").collect()
    // "ab" -> [ab], "qz" -> [qz], "zzz" -> [UNK] (z only continuation)
    assert(out(0).getInt(1) === 3 && out(0).getInt(2) === 1)
    assert(out(1).getInt(1) === 0 && out(1).getInt(2) === 0)
    // digest is order-sensitive and reproducible
    val again = WordPiece.tokenize(
      Seq((1L, "ab qz zzz")).toDF("doc_id", "text"), "doc_id", "text", v)
      .collect()(0).getString(3)
    assert(again === out(0).getString(3))
  }
}
