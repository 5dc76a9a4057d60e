package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/**
 * WordPiece (Schuster & Nakajima 2012; the BERT-family tokenizer) —
 * completes the engine's tokenizer trio next to [[Bpe]] (frequency
 * merges) and [[Unigram]] (SentencePiece EM pruning). Same merge LOOP
 * as BPE but the LIKELIHOOD merge criterion — score(l, r) =
 * count(lr) / (count(l) · count(r)) — and the `##` continuation
 * convention: non-initial symbols carry a `##` prefix, merging
 * (l, ##r) yields l+r (initial) or ##l+r (continuation). Application
 * is greedy longest-match-first prefix walking; a word with any
 * unmatchable step becomes ONE `[UNK]` token, exactly BERT's rule.
 *
 * Scale shape (the [[Bpe.learnMerges]] contract): training iterates
 * over the (word-type, freq) census — ONE corpus pass up front, then
 * vocab-sized frames only; each round is two hash aggregates (pair
 * counts, symbol counts) + a broadcast-sized join, and the only
 * collect is `limit(1)`. Deterministic by construction: exact Long
 * counts, IEEE double scores, total (score desc, pair asc) tie order
 * — parallelism-independent (verified 8- vs 32-thread before q180's
 * oracle was pinned). Application is map-only; the vocab rides the
 * closure.
 */
object WordPiece {

  /** One learned merge: rank (1-based), the produced piece, and the
    * integer counts behind its likelihood score (the score itself is
    * pairCount / (leftCount · rightCount) — kept as exact Longs so
    * oracles replay integers, not floats). */
  final case class Merge(rank: Int, piece: String, left: String,
                         right: String, pairCount: Long,
                         leftCount: Long, rightCount: Long)

  /** Trained model: the single-symbol alphabet plus merge-produced
    * pieces, in deterministic order. */
  final case class Vocab(alphabet: Seq[String], merges: Seq[Merge]) {
    def pieces: Seq[String] = alphabet ++ merges.map(_.piece)
  }

  val Unk = "[UNK]"

  /** BERT's guard: the longest-match walk is O(len^2) per word, so
    * pathological tokens (URLs, base64, DNA runs) become one [UNK]
    * outright instead of a quadratic scan — the standard
    * max_input_chars_per_word rule. */
  val MaxWordLength = 100

  private[ops] def toSymbols(word: String): Array[String] = {
    val out = new Array[String](word.length)
    var i = 0
    while (i < word.length) {
      out(i) = if (i == 0) word.substring(0, 1)
               else "##" + word.charAt(i)
      i += 1
    }
    out
  }

  /** Join a symbol with its continuation: (l, ##r) -> l+r, keeping
    * l's own initial/continuation marker. */
  private[ops] def joinPair(l: String, r: String): String =
    l + r.stripPrefix("##")

  /** Merge all non-overlapping (l, r) occurrences, left to right. */
  private[ops] def mergePair(syms: Array[String], l: String,
                             r: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += joinPair(l, r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** The (word, freq) census — ONE corpus pass (the Bpe contract). */
  private def wordCensus(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(filter(split(lower(col(textCol)), "\\s+"),
        t => t =!= "")).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__freq"))

  /** Learn up to `numMerges` merges by the likelihood criterion;
    * stops early when no pair reaches `minPairCount`. The alphabet is
    * every single symbol in the census (bounded by `alphabetSize`
    * top-by-frequency — web-scale unicode cannot explode the model),
    * ordered (count desc, symbol asc). */
  def learnVocab(docs: DataFrame, textCol: String, numMerges: Int,
                 minPairCount: Long = 2, alphabetSize: Int = 512): Vocab = {
    require(numMerges >= 1, "numMerges must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    val symsUdf = udf((w: String) => toSymbols(w))
    var vocab = wordCensus(docs, textCol)
      .select(symsUdf(col("__w")).as("__syms"), col("__freq"))
      .localCheckpoint(true)
    val alphabet = vocab
      .select(explode(col("__syms")).as("__s"), col("__freq"))
      .groupBy("__s").agg(sum("__freq").as("__c"))
      .orderBy(desc("__c"), asc("__s"))
      .limit(alphabetSize)
      .collect().map(_.getString(0)).toSeq
    val pairsUdf = udf((syms: Seq[String]) =>
      syms.iterator.sliding(2).withPartial(false)
        .map(p => (p.head, p(1))).toSeq)
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      val pairCounts = vocab
        .select(col("__freq"), explode(pairsUdf(col("__syms"))).as("__p"))
        .groupBy(col("__p._1").as("__l"), col("__p._2").as("__r"))
        .agg(sum("__freq").as("__c"))
      val symCounts = vocab
        .select(col("__freq"), explode(col("__syms")).as("__s"))
        .groupBy("__s").agg(sum("__freq").as("__sc"))
      // likelihood score; counts stay exact Longs, the score is IEEE
      // double (cast BEFORE multiplying — Long·Long overflows at
      // web-scale counts)
      val best = pairCounts
        .join(symCounts.select(col("__s").as("__l"),
          col("__sc").as("__lc")), "__l")
        .join(symCounts.select(col("__s").as("__r"),
          col("__sc").as("__rc")), "__r")
        .orderBy(
          (col("__c").cast("double") /
            (col("__lc").cast("double") * col("__rc").cast("double"))).desc,
          asc("__l"), asc("__r"))
        .limit(1)
        .select("__l", "__r", "__c", "__lc", "__rc")
        .collect()
      best match {
        case Array(Row(l: String, r: String, c: Long, lc: Long, rc: Long))
            if c >= minPairCount =>
          merges += Merge(rank, joinPair(l, r), l, r, c, lc, rc)
          val applyUdf = udf((syms: Seq[String]) =>
            mergePair(syms.toArray, l, r))
          val next = vocab
            .select(applyUdf(col("__syms")).as("__syms"), col("__freq"))
            .localCheckpoint(true) // flat lineage across iterations
          vocab.unpersist()
          vocab = next
          rank += 1
        case _ => done = true
      }
    }
    vocab.unpersist()
    Vocab(alphabet, merges.result())
  }

  /** BERT's greedy longest-match-first: walk the word taking the
    * longest vocab piece at each position (`##`-prefixed after the
    * first); if any position matches nothing, the WHOLE word is one
    * `[UNK]`. */
  private[ops] def encodeWord(word: String, pieces: Set[String]): Array[String] = {
    if (word.isEmpty) return Array.empty
    if (word.length > MaxWordLength) return Array(Unk)
    val out = Array.newBuilder[String]
    var start = 0
    while (start < word.length) {
      var end = word.length
      var found: String = null
      while (found == null && end > start) {
        val cand = (if (start > 0) "##" else "") + word.substring(start, end)
        if (pieces.contains(cand)) found = cand else end -= 1
      }
      if (found == null) return Array(Unk)
      out += found
      start = end
    }
    out.result()
  }

  /** Tokenize `textCol` under a learned vocab: per document, piece
    * count, `[UNK]` word count, and an order-sensitive digest.
    * Map-only — the piece set rides the closure. */
  def tokenize(docs: DataFrame, idCol: String, textCol: String,
               vocab: Vocab): DataFrame = {
    val pieces = vocab.pieces.toSet
    val enc = udf((text: String) =>
      if (text == null) Array.empty[String]
      else text.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .flatMap(w => encodeWord(w, pieces)))
    docs.select(col(idCol), enc(col(textCol)).as("__t"))
      .select(col(idCol),
        size(col("__t")).as("n_wp_tokens"),
        size(filter(col("__t"), t => t === Unk)).as("n_unk"),
        md5(concat_ws(" ", col("__t")).cast("binary")).as("token_digest"))
  }
}
