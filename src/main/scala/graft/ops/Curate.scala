package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * End-to-end corpus curation — the standard LLM training-data pipeline
 * composed from this library's operators in the order production
 * pipelines run them (cheap row-local gates first, pairwise/global
 * passes on the survivors):
 *
 *   1. novelty gate      — [[Novelty.exactNovel]] vs a historical
 *                          corpus (optional; drop already-ingested docs
 *                          before anything touches them)
 *   2. quality gate      — [[TextStats.qualityScore]] >= minQuality
 *   3. repetition gate   — [[TextStats.repetitionStats]] dup-2-gram cap
 *   4. LM gate           — [[TextStats.unigramLogProb]] cap (optional;
 *                          CCNet-style perplexity-proxy filter)
 *   5. exact dedup       — [[Dedup.exact]] (min-id winner)
 *   6. near dedup        — [[Dedup.dropNearDuplicates]] (MinHash LSH +
 *                          connected-components closure)
 *   7. decontamination   — [[Decontaminate.decontaminate]] vs an eval set
 *   8. split assignment  — [[Splits.assign]] (leakage-safe by group)
 *
 * Each stage only ever REMOVES or ANNOTATES rows, so stage counts are
 * monotone non-increasing — the per-stage report is the monitoring
 * surface a production run logs. Chunk/pack ([[Chunk]], [[Pack]]) are
 * deliberately downstream of curation (run per training config, not
 * per corpus version).
 */
object Curate {

  /** Per-stage surviving row counts, in pipeline order. */
  final case class Report(stages: Seq[(String, Long)]) {
    def counts: Map[String, Long] = stages.toMap
  }

  /**
   * Run the standard pipeline. Returns the curated, split-annotated
   * corpus and the per-stage report. `benchmark` is the eval set to
   * decontaminate against (pass a small DataFrame of documents).
   */
  def standard(docs: DataFrame, benchmark: DataFrame,
               idCol: String = "doc_id", textCol: String = "text",
               groupCol: String = "source",
               minQuality: Double = 0.3,
               maxDup2gramFrac: Double = 0.3,
               nearDupThreshold: Double = 0.7,
               contaminationN: Int = 5,
               historicalCorpus: Option[DataFrame] = None,
               maxAvgNegLogp: Option[Double] = None): (DataFrame, Report) = {
    val b = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    def stage(name: String, df: DataFrame): DataFrame = {
      b += name -> df.count(); df
    }
    val fresh = historicalCorpus match {
      case Some(hist) =>
        stage("novelty", Novelty.exactNovel(docs, hist, textCol))
      case None => docs
    }
    val quality = stage("quality",
      fresh.where(TextStats.qualityScore(col(textCol)) >= minQuality))
    val repetition = stage("repetition", {
      val keep = TextStats.repetitionStats(quality, idCol, textCol)
        .where(col("dup_2gram_frac") <= maxDup2gramFrac)
        .select(idCol)
      quality.join(keep, Seq(idCol), "left_semi")
    })
    val lmGated = maxAvgNegLogp match {
      case Some(cap) => stage("lm_gate", {
        // scored under the SURVIVORS' own unigram model (the corpus at
        // this stage IS the model corpus, CCNet-style self-scoring).
        // Gate by ANTI-joining the docs that EXCEED the cap: zero-token
        // docs produce no unigramLogProb row at all, and a semi-join on
        // the passers would silently drop them even under a non-binding
        // cap — an LM gate has no opinion on docs with no tokens.
        val drop = TextStats.unigramLogProb(repetition, idCol, textCol)
          .where(col("avg_neg_logp") > cap)
          .select(idCol)
        repetition.join(drop, Seq(idCol), "left_anti")
      })
      case None => repetition
    }
    val exact = stage("exact_dedup", Dedup.exact(lmGated, idCol, textCol))
    val near = stage("near_dedup",
      Dedup.dropNearDuplicates(exact, idCol, textCol,
        threshold = nearDupThreshold))
    val clean = stage("decontaminate",
      Decontaminate.decontaminate(near, benchmark, idCol, textCol,
        contaminationN))
    val split = stage("split", Splits.assign(clean, groupCol))
    (split, Report(b.toSeq))
  }
}
