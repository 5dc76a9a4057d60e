package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * BM25 lexical retrieval scoring over a document corpus — the
 * keyword-search half of a retrieval pipeline (the embedding half is
 * [[SimSearch]]). Extension surface (no reference counterpart).
 *
 * Uses the Lucene/Okapi BM25 variant: for each query term t,
 * `idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))` (always positive),
 * and a document's score is the sum over matched terms of
 * `idf * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))`.
 *
 * Scale shape: the query rides the plan as a LITERAL filter, so the
 * corpus-sized work is ONE map pass (tokenize, explode only the
 * query-matching tokens — the explode fan-out is bounded by matched
 * occurrences, not document length) into one (doc, term) hash
 * aggregate; document frequencies and the (N, avgdl) stats are tiny
 * frames broadcast back; the final top-k is a TakeOrdered, never a
 * global sort. Nothing document-sized shuffles except the matched
 * (doc, term, tf) rows. For repeated queries at 100 TB the tf frame
 * generalizes to a precomputed postings table bucketed by term —
 * the same one [[Dedup.jaccardPairsWithin]] builds.
 */
object Bm25 {

  /** Top-`topK` documents for `queryTerms`, scored with BM25 over
    * whitespace tokens of `lower(textCol)` (the corpus-wide token
    * convention). Only documents matching at least one term are
    * candidates. Deterministic: ties on the ROUNDED score break by
    * ascending id (rounding before ordering keeps the ranking
    * replayable across engines). */
  def topDocs(docs: DataFrame, idCol: String, textCol: String,
              queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
              topK: Int = 10): DataFrame = {
    require(queryTerms.nonEmpty, "empty query")
    val toks = filter(split(lower(col(textCol)), "\\s+"), t => t =!= "")
    val base = docs.select(col(idCol).as("__id"), toks.as("__ws"))
      .withColumn("__dl", size(col("__ws")))
    val stats = base.agg(count(lit(1)).as("__n"), avg("__dl").as("__avgdl"))
    val tf = base
      .select(col("__id"), col("__dl"), explode(col("__ws")).as("__t"))
      .where(col("__t").isin(queryTerms: _*))
      .groupBy("__id", "__dl", "__t").agg(count(lit(1)).as("__tf"))
    val dfs = tf.groupBy("__t").agg(count(lit(1)).as("__df"))
    // arithmetic written term-by-term so the DuckDB oracle can repeat
    // it with IEEE-identical operation order (k1+1 stays a SUM — a
    // pre-folded 2.2 literal parses to a different double)
    val idf = log(lit(1.0) +
      (col("__n") - col("__df") + lit(0.5)) / (col("__df") + lit(0.5)))
    val denom = col("__tf") +
      lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("__dl") / col("__avgdl"))
    val termScore = idf * col("__tf") * (lit(k1) + lit(1.0)) / denom
    tf.join(broadcast(dfs), "__t")
      .crossJoin(broadcast(stats))
      .groupBy("__id")
      .agg(count(lit(1)).as("n_terms_matched"),
        round(sum(termScore), 4).as("score"))
      .select(col("__id").as(idCol), col("n_terms_matched"), col("score"))
      .orderBy(desc("score"), col(idCol))
      .limit(topK)
  }
}
