package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** BPE training/application against the hand-worked Sennrich example
  * shape: merges, deterministic ties, greedy lowest-rank encoding. */
class BpeSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  // low:3 lower:2 newest:4 widest:1 — pair censuses worked by hand
  private val docs = Seq(
    (1L, "low low newest newest"),
    (2L, "low lower newest widest"),
    (3L, "lower newest"))
    .toDF("doc_id", "text")

  test("learns the hand-computed merge sequence with deterministic ties") {
    val merges = Bpe.learnMerges(docs, "text", numMerges = 4)
    assert(merges.map(m => (m.rank, m.left, m.right, m.count)) === Seq(
      (1, "w", "e", 6L),        // we: 2(lower) + 4(newest)
      (2, "l", "o", 5L),        // 5-way tie with (s,t),(t,</w>) -> left asc
      (3, "s", "t", 5L),
      (4, "st", "</w>", 5L)))
  }

  test("stops early below minPairCount") {
    val tiny = Seq((1L, "ab ab cd")).toDF("doc_id", "text")
    // (a,b):2 merges; then every remaining pair has count < 3
    val merges = Bpe.learnMerges(tiny, "text", numMerges = 10,
      minPairCount = 2)
    assert(merges.map(m => (m.left, m.right)).take(1) === Seq(("a", "b")))
    assert(merges.forall(_.count >= 2))
    assert(merges.size < 10)
  }

  test("mergePair is left-to-right non-overlapping") {
    assert(Bpe.mergePair(Array("a", "a", "a"), "a", "a").toSeq ===
      Seq("aa", "a"))
    assert(Bpe.mergePair(Array("x", "y", "x", "y"), "x", "y").toSeq ===
      Seq("xy", "xy"))
  }

  test("encodeWord merges greedily by lowest rank") {
    val ranks = Map(("w", "e") -> 1, ("l", "o") -> 2, ("s", "t") -> 3,
      ("st", "</w>") -> 4)
    assert(Bpe.encodeWord("lowest", ranks).toSeq ===
      Seq("lo", "we", "st</w>"))
    // no learnable pair: stays characters + terminal
    assert(Bpe.encodeWord("zq", Map.empty).toSeq === Seq("z", "q", "</w>"))
  }

  test("tokenize: per-doc counts and digests, map-only") {
    val merges = Bpe.learnMerges(docs, "text", numMerges = 4)
    val out = Bpe.tokenize(docs, "doc_id", "text", merges)
      .orderBy("doc_id").collect()
    // doc 1: low -> lo w </w> (3 syms; (w,</w>) unlearned) x2,
    //        newest -> n e we st</w> (4) x2 -> 14 tokens
    assert(out(0).getInt(1) === 14)
    assert(out.length === 3)
    // digests are deterministic across runs
    val again = Bpe.tokenize(docs, "doc_id", "text", merges)
      .orderBy("doc_id").collect()
    assert(out.map(_.getString(2)).toSeq === again.map(_.getString(2)).toSeq)
  }
}
