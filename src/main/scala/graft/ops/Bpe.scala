package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/**
 * Byte-pair-encoding tokenizer TRAINING and application — the
 * "learn a subword vocabulary from the corpus" step of an LLM data
 * pipeline. Extension surface (no reference counterpart).
 *
 * Training (Sennrich et al. 2016): start from characters (plus a
 * word-terminal marker), repeatedly merge the most frequent adjacent
 * symbol pair. Application (the GPT-2 encoder rule): greedily merge
 * the LOWEST-RANK learnable pair until none applies.
 *
 * Scale shape: the corpus is scanned ONCE into a (word, freq) census
 * — the classic BPE trick: iteration runs over word TYPES weighted by
 * frequency, never over the corpus again. Each of the `numMerges`
 * iterations is a small aggregate over the vocab-sized symbol frame
 * (pair explode → partial+final sum, argmax via TakeOrdered(1)); only
 * the single winning pair ever reaches the driver per iteration. The
 * symbol frame is localCheckpoint'd each round so lineage stays flat
 * across iterations. Application is map-only: the learned merge table
 * is a few KB riding the task closure.
 */
object Bpe {

  /** One learned merge: rank (1-based), the pair, and its weighted
    * count at the time of merging. */
  final case class Merge(rank: Int, left: String, right: String,
                         count: Long)

  /** Word-terminal marker (keeps "low ende" vs "lowe nde" boundaries
    * distinct, as in the original BPE formulation). */
  val Terminal = "</w>"

  private[ops] def toSymbols(word: String): Array[String] =
    word.map(_.toString).toArray :+ Terminal

  /** Merge all non-overlapping occurrences of (l, r), left to right —
    * "aaa" under (a,a) gives ["aa", "a"]. */
  private[ops] def mergePair(syms: Array[String], l: String,
                             r: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** The (word, freq) census — ONE corpus pass; everything else in
    * training iterates over this vocab-sized frame. */
  private def wordCensus(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(filter(split(lower(col(textCol)), "\\s+"),
        t => t =!= "")).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__freq"))

  /** Learn up to `numMerges` merges; stops early when no pair reaches
    * `minPairCount`. Ties break deterministically: count desc, then
    * (left, right) asc. */
  def learnMerges(docs: DataFrame, textCol: String, numMerges: Int,
                  minPairCount: Long = 2): Seq[Merge] = {
    require(numMerges >= 1, "numMerges must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    val symsUdf = udf((w: String) => toSymbols(w))
    var vocab = wordCensus(docs, textCol)
      .select(symsUdf(col("__w")).as("__syms"), col("__freq"))
      .localCheckpoint(true)
    val pairsUdf = udf((syms: Seq[String]) =>
      syms.iterator.sliding(2).withPartial(false)
        .map(p => (p.head, p(1))).toSeq)
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      val best = vocab
        .select(col("__freq"), explode(pairsUdf(col("__syms"))).as("__p"))
        .groupBy(col("__p._1").as("__l"), col("__p._2").as("__r"))
        .agg(sum("__freq").as("__c"))
        .orderBy(desc("__c"), asc("__l"), asc("__r"))
        .limit(1).collect()
      best match {
        case Array(Row(l: String, r: String, c: Long)) if c >= minPairCount =>
          merges += Merge(rank, l, r, c)
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
    merges.result()
  }

  /** GPT-2-style greedy application: repeatedly merge the lowest-rank
    * adjacent pair until none is learnable. */
  private[ops] def encodeWord(word: String,
                              ranks: Map[(String, String), Int]): Array[String] = {
    var syms = toSymbols(word)
    var continue = true
    while (continue && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i + 1 < syms.length) {
        val rk = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (rk < bestRank) { bestRank = rk; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) continue = false
      else syms = mergePair(syms, syms(bestIdx), syms(bestIdx + 1))
    }
    syms
  }

  /** Tokenize `textCol` with a learned merge list: per document, the
    * BPE token count and an order-sensitive token digest. Map-only —
    * the merge table rides the closure. */
  def tokenize(docs: DataFrame, idCol: String, textCol: String,
               merges: Seq[Merge]): DataFrame = {
    val ranks = merges.map(m => (m.left, m.right) -> m.rank).toMap
    val enc = udf((text: String) =>
      if (text == null) Array.empty[String]
      else text.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .flatMap(w => encodeWord(w, ranks)))
    docs.select(col(idCol), enc(col(textCol)).as("bpe_tokens"))
      .select(col(idCol),
        size(col("bpe_tokens")).as("n_bpe_tokens"),
        md5(concat_ws(" ", col("bpe_tokens")).cast("binary"))
          .as("token_digest"))
  }
}
