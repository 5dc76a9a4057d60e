package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Unigram-LM subword tokenizer TRAINING and application (Kudo 2018,
 * the SentencePiece unigram model) — the other half of the modern
 * tokenizer toolbox next to [[Bpe]]: where BPE GROWS a vocabulary by
 * merging frequent pairs, the unigram model starts from a large seed
 * vocabulary and PRUNES it under an EM-fitted piece-probability model,
 * segmenting with Viterbi. Extension surface (no reference
 * counterpart).
 *
 * Faithful-but-deterministic simplifications, documented because the
 * pinned-VALUES oracle depends on them:
 *  - VITERBI-EM: the E-step accumulates piece counts from each word's
 *    single best segmentation (hard EM) instead of forward-backward
 *    expected counts. This makes every accumulated count an INTEGER
 *    (word-frequency-weighted piece usages), so the distributed sum is
 *    order-independent — the same reason the BPE trainer is
 *    parallelism-independent. Soft-EM fractional counts would be
 *    float sums whose value depends on reduction order.
 *  - Pruning keeps the TOP pieces by usage count (count desc, piece
 *    asc — a total order) instead of the likelihood-loss ranking;
 *    single-character pieces are never pruned (they guarantee every
 *    word stays segmentable, exactly SentencePiece's rule).
 *  - Words are whitespace tokens of the lowercased text (the same
 *    tokenization as [[Bpe]]); no whole-word marker — pieces are plain
 *    substrings within a word.
 *
 * Scale shape: ONE corpus pass builds the (word, freq) census; the
 * seed table is one substring-explode aggregate over word TYPES; each
 * EM round is one map+aggregate over the census (the piece model rides
 * the closure as a broadcast map, piece-count rows collected are
 * bounded by the vocabulary size). Application is map-only.
 */
object Unigram {

  /** One vocabulary piece: its final Viterbi-EM usage count and
    * log-probability under the fitted model. */
  final case class Piece(piece: String, count: Long, logprob: Double)

  /** Word census — identical tokenization to [[Bpe]]'s (lowercase,
    * whitespace split), one corpus pass. */
  private def wordCensus(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(filter(split(lower(col(textCol)), "\\s+"),
        t => t =!= "")).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__freq"))

  /** Best (max total logprob) segmentation of `word` into vocabulary
    * pieces, by dynamic programming over character positions. Ties
    * resolve to the LONGEST piece at each boundary (strict-greater
    * updates scanning piece starts left to right), a total
    * deterministic rule. A character absent from the model (possible
    * only at apply time, on text outside the training corpus) becomes
    * its own piece at [[UnkLogprob]], so segmentation is total. */
  private[ops] def viterbi(word: String,
                           scores: scala.collection.Map[String, Double],
                           maxPieceLen: Int): Array[String] = {
    val n = word.length
    if (n == 0) return Array.empty
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = new Array[Int](n + 1) // start index of the piece ending at i
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        if (best(j) > Double.NegativeInfinity) {
          val p = word.substring(j, i)
          val s = scores.get(p) match {
            case Some(lp) => lp
            case None => if (i - j == 1) UnkLogprob
              else Double.NegativeInfinity
          }
          if (s > Double.NegativeInfinity && best(j) + s > best(i)) {
            best(i) = best(j) + s
            back(i) = j
          }
        }
        j += 1
      }
      i += 1
    }
    // walk back — total by the single-char fallback
    val out = List.newBuilder[String]
    var pos = n
    val rev = scala.collection.mutable.ArrayBuffer.empty[String]
    while (pos > 0) { val j = back(pos); rev += word.substring(j, pos); pos = j }
    out ++= rev.reverse
    out.result().toArray
  }

  /** Log-probability assigned to an out-of-model single character at
    * APPLY time (training-corpus characters are always in the model).
    * Far below any fitted piece, so unknowns never displace real
    * pieces, but finite, so segmentation stays total. */
  private[ops] val UnkLogprob: Double = -1e4

  /** One Viterbi-EM count pass: word-frequency-weighted integer usage
    * counts of each piece over the census' best segmentations.
    * Deterministic: integer sums, and the census frame's partitioning
    * cannot affect a sum's value. */
  private def countPass(census: DataFrame,
                        scores: Map[String, Double],
                        maxPieceLen: Int): Map[String, Long] = {
    val spark = census.sparkSession
    val bc = spark.sparkContext.broadcast(scores)
    try {
      val segUdf = udf((w: String) => viterbi(w, bc.value, maxPieceLen))
      census
        .select(explode(segUdf(col("__w"))).as("__p"), col("__freq"))
        .groupBy("__p").agg(sum("__freq").as("__c"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    } finally
      // learnVocab calls this once per EM pass and per prune round:
      // without an eager destroy the per-pass score broadcasts pile up
      // on driver and executors until the GC-driven ContextCleaner
      // happens to reclaim them. The collect above is the last use.
      bc.destroy()
  }

  /** Fit piece log-probabilities from integer counts. Zero-count
    * single-character pieces (kept for segmentability) score a floor
    * just below the rarest used piece — deterministic, and they can
    * never win a tie against a used piece. */
  private def fitScores(counts: Map[String, Long],
                        keep: Iterable[String]): Map[String, Double] = {
    val total = math.max(counts.values.sum, 1L).toDouble
    val floor = math.log(0.5 / total)
    keep.iterator.map { p =>
      val c = counts.getOrElse(p, 0L)
      p -> (if (c > 0) math.log(c / total) else floor)
    }.toMap
  }

  /**
   * Learn a unigram vocabulary of (at most) `vocabSize` pieces.
   *
   * Steps: (1) seed with every <= `maxPieceLen`-char substring of the
   * word types, weighted by word frequency, keeping the heaviest
   * `seedSize` plus ALL single characters; (2) `emIters` Viterbi-EM
   * rounds over the census; (3) iterative pruning — drop to
   * `pruneKeep` of the current multi-char pieces (never below
   * `vocabSize`, never a single char) and re-fit, until the target
   * size holds; (4) one final count pass for the reported counts.
   *
   * Fully deterministic and parallelism-independent: integer counts,
   * total (count desc, piece asc) orders at every selection point.
   */
  def learnVocab(docs: DataFrame, textCol: String, vocabSize: Int,
                 maxPieceLen: Int = 8, seedSize: Int = 2000,
                 emIters: Int = 2, pruneKeep: Double = 0.8): Seq[Piece] = {
    require(vocabSize >= 1, "vocabSize must be >= 1")
    require(maxPieceLen >= 1, "maxPieceLen must be >= 1")
    require(seedSize >= vocabSize,
      "seedSize must be >= vocabSize (pruning only shrinks)")
    require(pruneKeep > 0.0 && pruneKeep < 1.0, "pruneKeep must be in (0,1)")
    val census = wordCensus(docs, textCol).localCheckpoint(true)
    try {
      // 1. seed: substring explode over word TYPES (freq-weighted)
      val subUdf = udf((w: String) => {
        val out = Seq.newBuilder[String]
        var i = 0
        while (i < w.length) {
          var j = i + 1
          while (j <= math.min(w.length, i + maxPieceLen)) {
            out += w.substring(i, j); j += 1
          }
          i += 1
        }
        out.result()
      })
      val weighted = census
        .select(explode(subUdf(col("__w"))).as("__p"), col("__freq"))
        .groupBy("__p").agg(sum("__freq").as("__c"))
        .localCheckpoint(true)
      val chars = weighted.where(length(col("__p")) === 1)
        .collect().map(r => r.getString(0) -> r.getLong(1))
      val multi = weighted.where(length(col("__p")) > 1)
        .orderBy(desc("__c"), asc("__p"))
        .limit(math.max(seedSize - chars.length, 0))
        .collect().map(r => r.getString(0) -> r.getLong(1))
      weighted.unpersist()
      var counts: Map[String, Long] = (chars ++ multi).toMap
      var vocab: Set[String] = counts.keySet
      val charSet = chars.map(_._1).toSet
      // 2./3. EM + iterative pruning to the target size
      def emRound(): Unit = {
        var it = 0
        while (it < emIters) {
          counts = countPass(census, fitScores(counts, vocab), maxPieceLen)
          it += 1
        }
      }
      emRound()
      // single characters are never pruned, so the effective floor is
      // the character-set size — a vocabSize below it stops there
      while (vocab.size > vocabSize && vocab.diff(charSet).nonEmpty) {
        val multiNow = vocab.diff(charSet)
        val target = math.max(vocabSize - charSet.size,
          math.min(multiNow.size - 1,
            math.ceil(multiNow.size * pruneKeep).toInt))
        val kept = multiNow.toSeq
          .map(p => (p, counts.getOrElse(p, 0L)))
          .sortBy { case (p, c) => (-c, p) }
          .take(math.max(target, 0)).map(_._1).toSet
        vocab = charSet ++ kept
        emRound()
      }
      // 4. final reported counts under the final model
      val finalCounts = countPass(census, fitScores(counts, vocab),
        maxPieceLen)
      val scores = fitScores(finalCounts, vocab)
      vocab.toSeq
        .map(p => Piece(p, finalCounts.getOrElse(p, 0L), scores(p)))
        .sortBy(p => (-p.count, p.piece))
    } finally census.unpersist()
  }

  /** Tokenize `textCol` with a learned vocabulary: per document, the
    * unigram token count and an order-sensitive token digest — the
    * same report shape as [[Bpe.tokenize]]. Map-only; the piece model
    * rides the closure. */
  def tokenize(docs: DataFrame, idCol: String, textCol: String,
               vocab: Seq[Piece]): DataFrame = {
    val maxLen = if (vocab.isEmpty) 1 else vocab.map(_.piece.length).max
    val scores = vocab.map(p => p.piece -> p.logprob).toMap
    val enc = udf((text: String) =>
      if (text == null) Array.empty[String]
      else text.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .flatMap(w => viterbi(w, scores, maxLen)))
    docs.select(col(idCol), enc(col(textCol)).as("unigram_tokens"))
      .select(col(idCol),
        size(col("unigram_tokens")).as("n_unigram_tokens"),
        md5(concat_ws(" ", col("unigram_tokens")).cast("binary"))
          .as("token_digest"))
  }
}
