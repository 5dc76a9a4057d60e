package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Benchmark decontamination — the training-data hygiene step that
 * removes corpus documents sharing word n-grams with an evaluation
 * benchmark, so held-out test sets stay held out. Extension surface
 * beyond the reference (which has no corpus-hygiene operators at all);
 * the n-gram-overlap rule is the published practice for LLM training
 * sets (e.g. GPT-3 appendix C / PaLM-style 8-gram overlap).
 *
 * Scale design (100 TB corpus, MB-scale benchmark):
 *  - the benchmark's distinct gram set is SMALL by definition (eval
 *    suites are a few MB) — it is broadcast, so the corpus NEVER
 *    shuffles for the probe: one map stage explodes narrow (id, gram)
 *    rows, the broadcast-hash join filters them, and the per-doc hit
 *    count is a partial+final hash aggregate;
 *  - corpus text never travels: the anti-join removing contaminated
 *    docs carries ids only;
 *  - if the benchmark ever outgrows broadcast range, swap the join key
 *    to `xxhash64(gram)` and let AQE pick a shuffled hash join — the
 *    operator shape stays the same.
 *
 * Gram semantics are [[Dedup.shingleSet]]'s: normalized (lower, trimmed,
 * whitespace-squeezed) word n-grams, distinct per document, with a
 * whole-text gram for documents shorter than n tokens.
 */
object Decontaminate {

  /** Distinct (id, gram) postings of word n-grams. */
  private[ops] def gramPostings(df: DataFrame, idCol: String,
                                textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("__id"),
      explode(Dedup.shingles(col(textCol), n)).as("__g"))

  /** The benchmark's distinct gram set — ONE implementation shared by
    * both report paths, whose outputs must stay bit-identical (they
    * check against the same oracle). */
  private def benchGrams(benchmark: DataFrame, textCol: String,
                         n: Int): DataFrame =
    benchmark
      .select(explode(Dedup.shingles(col(textCol), n)).as("__g"))
      .distinct()

  /** Shared report tail: verify postings against the true gram set and
    * count distinct shared grams per doc (postings are distinct per
    * doc, so count(*) == distinct shared grams). */
  private def reportOf(postings: DataFrame, bench: DataFrame,
                       idCol: String): DataFrame =
    postings.join(bench, Seq("__g"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_hits"))
      .select(col("__id").as(idCol), col("n_hits"))

  /**
   * SURGICAL decontamination: instead of dropping every document that
   * shares an n-gram with the benchmark ([[decontaminate]] — which
   * throws away the whole document for one quoted sentence), mask
   * only the contaminated SPANS out of the text, keeping the
   * surrounding novel content. The benchmark's distinct n-grams
   * become a [[SpanDedup.SpanIndex]] hot set and masking is
   * [[SpanDedup.maskWithIndex]]'s map-only kernel — broadcast set,
   * no join, no shuffle, streaming-safe; the returned text is the
   * library's canonical normalized form ("" when a doc was pure
   * benchmark overlap). `maxGrams` guards the driver the same way
   * [[SpanDedup.fitSpanIndex]] does — an eval set is small by
   * definition; a "benchmark" that isn't should use the distributed
   * join form instead.
   */
  def maskContaminatedSpans(corpus: DataFrame, benchmark: DataFrame,
                            textCol: String, n: Int,
                            maxGrams: Int = 1000000): DataFrame = {
    // ≥n-token guard: Dedup.shingles emits a whole-text pseudo-gram
    // for shorter docs (MinHash wants that; a span hot set must not —
    // though a sub-n gram can never equal an n-token slice, keeping
    // it out makes the census match the oracle's len >= n guard)
    val grams = benchmark
      .where(size(split(Dedup.normalized(col(textCol)), " ")) >= n)
      .select(explode(Dedup.shingles(col(textCol), n)).as("__g"))
      .distinct()
    val hot = grams.take(maxGrams + 1).map(_.getString(0))
    require(hot.length <= maxGrams,
      s"benchmark gram census exceeds maxGrams=$maxGrams — not an " +
        "eval-set-sized benchmark; use a distributed-join masking form")
    SpanDedup.maskWithIndex(corpus, SpanDedup.SpanIndex(hot.toSet, n),
      textCol)
  }

  /**
   * Per-document contamination report: corpus docs sharing at least one
   * word n-gram with the benchmark, with the count of distinct shared
   * grams. Docs absent from the output are clean.
   */
  def contaminationReport(corpus: DataFrame, benchmark: DataFrame,
                          idCol: String, textCol: String,
                          n: Int = 5): DataFrame =
    reportOf(
      gramPostings(corpus, idCol, textCol, n),
      broadcast(benchGrams(benchmark, textCol, n)), idCol)

  /**
   * [[contaminationReport]] behind a broadcast Bloom-filter prefilter —
   * the shape for when the benchmark gram set outgrows a broadcast
   * HASH join but still fits as a Bloom filter (~10 bits/gram at 1%
   * fpp vs ~100 bytes/entry in a hash relation: a 1B-gram benchmark
   * is ~1.2 GB of filter vs ~100 GB of hash table).
   *
   * Plan shape: the filter is built once from the benchmark's hashed
   * grams (driver-side sketch merge), shipped to executors as a
   * broadcast variable, and applied as a MAP-ONLY prefilter on the
   * corpus postings — the 100 TB side never shuffles to discover it is
   * clean. Only bloom-positive postings (true hits + fpp noise) reach
   * the exact verify join, which removes false positives, so the
   * OUTPUT is bit-identical to [[contaminationReport]] — same oracle.
   * The verify join carries no broadcast hint: its probe side is the
   * tiny prefiltered set, and AQE picks the strategy.
   */
  def contaminationReportViaBloom(corpus: DataFrame, benchmark: DataFrame,
                                  idCol: String, textCol: String,
                                  n: Int = 5, fpp: Double = 0.01): DataFrame = {
    val bench = benchGrams(benchmark, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nGrams = math.max(bench.count(), 1L)
    val bloom = bench.select(xxhash64(col("__g")).as("__gh"))
      .stat.bloomFilter("__gh", nGrams, fpp)
    val sc = corpus.sparkSession.sparkContext
    val bloomB = sc.broadcast(bloom)
    val mightContain = udf((h: Long) => bloomB.value.mightContain(h))
    val report = reportOf(
      gramPostings(corpus, idCol, textCol, n)
        .where(mightContain(xxhash64(col("__g")))),
      bench, idCol)
    // materialize eagerly so the persisted gram set and the broadcast
    // filter can be released instead of leaking per call
    val out = report.localCheckpoint(true)
    bench.unpersist()
    bloomB.destroy()
    out
  }

  /** The corpus minus every document contaminated by the benchmark —
    * ids-only anti-join against [[contaminationReport]]. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
                    idCol: String, textCol: String, n: Int = 5): DataFrame = {
    val dirty = contaminationReport(corpus, benchmark, idCol, textCol, n)
      .select(idCol)
    corpus.join(dirty, Seq(idCol), "left_anti")
  }

  /** The benchmark's EXACT distinct gram set as a broadcastable fit
    * artifact — the streaming-gate form of decontamination: fit once
    * per benchmark version, probe per row with [[cleanFlag]] (no join,
    * no shuffle, no state — works inside a streaming micro-batch).
    * Exact, not a Bloom sketch: the gate must not drop clean docs to
    * false positives. Driver-bounded by `maxGrams` with a loud
    * failure (an eval set is small by definition; a "benchmark" that
    * is not should use the distributed [[decontaminate]] join). */
  final case class BenchGrams(grams: Set[String], n: Int)
    extends Serializable

  def fitBenchGrams(benchmark: DataFrame, textCol: String, n: Int = 5,
                    maxGrams: Int = 1000000): BenchGrams = {
    val rows = benchGrams(benchmark, textCol, n)
      .limit(maxGrams + 1).collect()
    require(rows.length <= maxGrams,
      s"benchmark has more than $maxGrams distinct $n-grams — not an " +
        "eval set; use the distributed decontaminate join instead")
    BenchGrams(rows.map(_.getString(0)).toSet, n)
  }

  /** Docs plus a boolean `flagCol`: true = shares NO n-gram with the
    * fitted benchmark set — exactly [[decontaminate]]'s keep rule
    * ([[Dedup.shingleSet]] gram semantics incl. the whole-text
    * pseudo-gram for short docs), as a map-only broadcast probe. */
  def cleanFlag(docs: DataFrame, textCol: String, bench: BenchGrams,
                flagCol: String): DataFrame = {
    require(!docs.columns.contains(flagCol),
      s"input column $flagCol already exists")
    val sc = docs.sparkSession.sparkContext
    val bc = sc.broadcast(bench.grams)
    val hit = udf((gs: Seq[String]) =>
      gs != null && gs.exists(bc.value.contains))
    docs.withColumn(flagCol,
      !hit(Dedup.shingles(col(textCol), bench.n)))
  }

  /**
   * Per-document containment RATIO: the fraction of each doc's
   * distinct n-grams present in the reference set — the graded form of
   * [[contaminationReport]] (which only counts hits), usable as a
   * novelty gate threshold ("drop docs more than X% already seen").
   * Every doc with non-empty normalized text appears (clean docs at
   * 0.0 — [[graft.ops.Dedup.shingles]] emits the whole text as one
   * gram for docs shorter than n tokens).
   *
   * Same plan shape as [[contaminationReport]]: the reference gram set
   * broadcasts into a LEFT join on the postings, hits fold into the
   * per-doc aggregate — the corpus never shuffles. For a reference too
   * big to broadcast, prefilter postings with the Bloom path
   * ([[contaminationReportViaBloom]]'s shape) and left-join only the
   * bloom-positive rows; the ratio denominator is unaffected.
   */
  def containmentScores(corpus: DataFrame, reference: DataFrame,
                        idCol: String, textCol: String,
                        n: Int = 5): DataFrame =
    gramPostings(corpus, idCol, textCol, n)
      .join(broadcast(benchGrams(reference, textCol, n)
        .withColumn("__hit", lit(true))), Seq("__g"), "left")
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__hit"), 1L).otherwise(0L)).as("n_hits"))
      // long/long division — engine-portable at 4 decimals
      .select(col("__id").as(idCol), col("n_grams"), col("n_hits"),
        round(col("n_hits").cast("double") / col("n_grams"), 4)
          .as("containment"))

  /**
   * SEMANTIC decontamination: flag corpus rows whose embedding is
   * near-identical (cosine >= `threshold`) to ANY benchmark embedding
   * — the embedding-space complement of the n-gram report above, which
   * paraphrased benchmark leaks slip past (n-gram overlap misses a
   * reworded test question; its embedding doesn't move).
   *
   * Scale shape (100 TB corpus, MB-scale benchmark): the benchmark
   * side is small by definition, so it BROADCASTS into an intentional
   * cross (the q50/q52 single-frame-broadcast pattern, |B| rows
   * instead of one) and the per-row max folds MAP-SIDE in the partial
   * aggregate — the corpus never shuffles; the only exchange is the
   * final per-id hash-agg merge, carrying one (id, max) row per
   * corpus row. For a benchmark too big to broadcast, prefilter with
   * an SRP band index ([[Novelty.fitBandIndex]]'s shape) and
   * brute-force only bucket-colliding candidates; the verify
   * arithmetic stays this one.
   */
  def semanticReport(corpus: DataFrame, benchmark: DataFrame,
                     idCol: String, vecCol: String,
                     threshold: Double): DataFrame = {
    // norms hoisted to once-per-row on BOTH sides: the per-crossed-row
    // work is then one dot-product fold instead of three (same scalar
    // expression tree as cosine(), bit-identical results)
    val bench = broadcast(
      benchmark.select(col(vecCol).cast("array<double>").as("__bv"))
        .withColumn("__bn", SimSearch.norm(col("__bv"))))
    corpus.select(col(idCol), col(vecCol).cast("array<double>").as("__cv"))
      .withColumn("__cn", SimSearch.norm(col("__cv")))
      .crossJoin(bench)
      .groupBy(col(idCol))
      .agg(max(SimSearch.dot(col("__cv"), col("__bv")) /
        (col("__cn") * col("__bn"))).as("__mc"))
      .select(col(idCol),
        round(col("__mc"), 4).as("max_benchmark_cosine"),
        (col("__mc") >= threshold).as("contaminated"))
  }

  /** [[semanticReport]] as a corpus transform: drop flagged rows via
    * an ids-only anti-join (same tail as [[decontaminate]]). */
  def semanticDecontaminate(corpus: DataFrame, benchmark: DataFrame,
                            idCol: String, vecCol: String,
                            threshold: Double): DataFrame = {
    val dirty = semanticReport(corpus, benchmark, idCol, vecCol, threshold)
      .where(col("contaminated")).select(idCol)
    corpus.join(dirty, Seq(idCol), "left_anti")
  }
}
