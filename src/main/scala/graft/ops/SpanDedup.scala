package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Repeated-substring masking (the "dedupe repeated substrings" recipe
 * of Lee et al. 2022, word-n-gram span form): any n-word span that
 * occurs in at least `minDocFreq` distinct documents is boilerplate —
 * license headers, navigation chrome, templated disclaimers — and is
 * masked OUT of every document, keeping the surrounding novel text.
 * This is sub-document dedup: exact/near/semantic dedup drop whole
 * documents, this removes the repeated REGIONS inside otherwise-novel
 * documents. Extension surface; no reference citation (the reference
 * is batch sentiment only).
 *
 * Scale design (100 TB):
 *  - pass 1 (span census): per-doc DISTINCT n-grams explode narrow and
 *    hash-aggregate to document frequencies — partial aggregation
 *    collapses hot grams map-side, so a million-doc license header is
 *    one row per map task, never a skew funnel (same argument as
 *    [[Dedup.jaccardPairsWithin]]'s maxDf cap);
 *  - the hot-gram set is TINY by construction (boilerplate, not
 *    content), so it broadcast-joins back to each doc's gram postings
 *    and per-doc hot lists aggregate narrow;
 *  - pass 2 (masking): a per-row kernel re-derives the doc's spans
 *    against ITS OWN hot list — the corpus text itself never shuffles;
 *    only (id, hot-gram) rows (bounded by boilerplate volume) move.
 *  - [[maskRepeatedSpans]] keeps the hot set distributed through the
 *    join (no driver-side collect, no driver-memory cap); the
 *    [[fitSpanIndex]]/[[maskWithIndex]] split deliberately trades
 *    that for a collected broadcast Set — guarded by `maxSpans` —
 *    to get a map-only, streaming-safe apply path.
 *
 * Output text is NORMALIZED (lowercased, whitespace-squeezed) — the
 * same canonical form every dedup operator in this library keys on.
 */
object SpanDedup {

  /** The masking kernel: normalize, mark every position covered by a
    * hot n-gram occurrence (overlaps union), emit the uncovered
    * tokens in order — "" when fully covered, null for null text.
    * Single pass; adjacencies CREATED by masking are not re-checked
    * (Lee et al. semantics). */
  private[ops] def maskSpans(text: String, n: Int, hot: Set[String]): String = {
    if (text == null) return null
    val tokens = text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
    if (tokens.length < n || hot.isEmpty) return tokens.mkString(" ")
    val covered = new Array[Boolean](tokens.length)
    var i = 0
    while (i <= tokens.length - n) {
      if (hot.contains(tokens.slice(i, i + n).mkString(" "))) {
        var j = i
        while (j < i + n) { covered(j) = true; j += 1 }
      }
      i += 1
    }
    val sb = new java.lang.StringBuilder
    i = 0
    while (i < tokens.length) {
      if (!covered(i)) {
        if (sb.length > 0) sb.append(' ')
        sb.append(tokens(i))
      }
      i += 1
    }
    sb.toString
  }

  /** Documents with at least n tokens — [[Dedup.shingleSet]] emits the
    * WHOLE text as one sub-n pseudo-gram for shorter docs (MinHash
    * wants that; a span census must not), so both census and postings
    * exclude them, exactly like the oracle's `len(ws) >= n` guard. */
  private def atLeastNTokens(df: DataFrame, textCol: String, n: Int): DataFrame =
    df.where(size(split(Dedup.normalized(col(textCol)), " ")) >= n)

  /** The repeated spans of a corpus: n-grams present in at least
    * `minDocFreq` distinct documents, with their document frequency.
    * Per-doc distinct grams ([[Dedup.shingles]]) make `count(*)` the
    * document frequency directly — no count-distinct expansion. */
  def repeatedSpans(df: DataFrame, idCol: String, textCol: String,
                    n: Int, minDocFreq: Int): DataFrame =
    atLeastNTokens(df, textCol, n)
      .select(col(idCol).as("__id"),
        explode(Dedup.shingles(col(textCol), n)).as("gram"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("doc_freq"))
      .where(col("doc_freq") >= minDocFreq)

  /** Broadcastable span index: the hot-span set of one corpus
    * version — fit once per version with [[fitSpanIndex]], applied
    * per ingest batch (or per streaming micro-batch) with
    * [[maskWithIndex]], exactly the fit/apply split
    * [[Novelty.BandIndex]] gives the novelty gate. */
  final case class SpanIndex(hot: Set[String], n: Int)

  /** Fit the [[SpanIndex]] of a corpus. The census stays distributed;
    * only the (boilerplate-sized) hot set collects. `maxSpans` guards
    * the driver: a census bigger than it (e.g. minDocFreq=2 over a
    * duplicate-heavy corpus) fails fast — use the fully-distributed
    * [[maskRepeatedSpans]] for that profile instead. */
  def fitSpanIndex(corpus: DataFrame, idCol: String, textCol: String,
                   n: Int, minDocFreq: Int,
                   maxSpans: Int = 1000000): SpanIndex = {
    val hot = repeatedSpans(corpus, idCol, textCol, n, minDocFreq)
      .select(col("gram")).take(maxSpans + 1).map(_.getString(0))
    require(hot.length <= maxSpans,
      s"span census exceeds maxSpans=$maxSpans; the hot set is not " +
        "boilerplate-sized — use maskRepeatedSpans (distributed join " +
        "form) instead of the broadcast index")
    SpanIndex(hot.toSet, n)
  }

  /** Persist a fitted [[SpanIndex]]: the hot-span set as parquet, the
    * gram arity in a one-row meta table — same durable fit/apply
    * split as [[Novelty.saveBandIndex]] and `SimSearch.ivfSave`. */
  def saveSpanIndex(spark: org.apache.spark.sql.SparkSession,
                    index: SpanIndex, dir: String): Unit = {
    import spark.implicits._
    index.hot.toSeq.toDF("gram")
      .write.mode("overwrite").parquet(s"$dir/hot")
    Seq(index.n).toDF("n")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Load a [[SpanIndex]] persisted by [[saveSpanIndex]]. The hot set
    * collects back to the driver — by the [[fitSpanIndex]] contract it
    * is boilerplate-sized. */
  def loadSpanIndex(spark: org.apache.spark.sql.SparkSession,
                    dir: String): SpanIndex = {
    val n = spark.read.parquet(s"$dir/meta").head().getInt(0)
    val hot = spark.read.parquet(s"$dir/hot")
      .collect().map(_.getString(0)).toSet
    SpanIndex(hot, n)
  }

  /** Map-only masking against a prebuilt [[SpanIndex]]: per-row kernel
    * + broadcast set, no join, no shuffle, no state — streaming-safe,
    * and the production serving shape (the census is NOT recomputed
    * per ingest batch). Same output contract as
    * [[maskRepeatedSpans]]. */
  def maskWithIndex(docs: DataFrame, index: SpanIndex,
                    textCol: String): DataFrame = {
    val hotB = docs.sparkSession.sparkContext.broadcast(index.hot)
    val n = index.n
    val mask = udf((text: String) => maskSpans(text, n, hotB.value))
    docs.withColumn(textCol, mask(col(textCol)))
  }

  /** File-source stream wired through [[maskWithIndex]]. */
  def streamMask(spark: org.apache.spark.sql.SparkSession, dir: String,
                 index: SpanIndex, textCol: String): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    maskWithIndex(spark.readStream.schema(schema).parquet(dir),
      index, textCol)
  }

  /**
   * Mask every occurrence of every repeated span out of every
   * document. Returns the input frame with `textCol` replaced by the
   * masked, normalized text ("" when a doc was pure boilerplate —
   * the row survives so downstream gates can drop it deliberately).
   */
  def maskRepeatedSpans(df: DataFrame, idCol: String, textCol: String,
                        n: Int, minDocFreq: Int): DataFrame = {
    val clash = df.columns.toSet.intersect(Set("__hot", "__id"))
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with maskRepeatedSpans' reserved names")
    val hot = repeatedSpans(df, idCol, textCol, n, minDocFreq)
      .select(col("gram"))
    // per-doc hot-gram lists: only grams that are BOTH in the doc and
    // hot survive the broadcast join — narrow (id, gram) rows
    // no broadcast hint: boilerplate hot sets are tiny (AQE broadcasts
    // them at runtime), but minDocFreq=2 over a duplicate-heavy corpus
    // can make `hot` arbitrarily large — the shuffled join degrades
    // gracefully where a forced broadcast would OOM
    val perDoc = atLeastNTokens(df, textCol, n)
      .select(col(idCol).as("__id"),
        explode(Dedup.shingles(col(textCol), n)).as("gram"))
      .join(hot, Seq("gram"))
      .groupBy(col("__id"))
      .agg(collect_set(col("gram")).as("__hot"))
    val mask = udf((text: String, hot: Seq[String]) =>
      maskSpans(text, n, if (hot == null) Set.empty[String] else hot.toSet))
    df.join(perDoc, df(idCol) === perDoc("__id"), "left")
      .withColumn(textCol, mask(col(textCol), col("__hot")))
      .drop("__id", "__hot")
  }
}
