package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling for data mixing — the per-source quota and
 * rate controls an LLM training pipeline uses to compose its corpus
 * mixture. Extension surface beyond the reference. Both operators are
 * hash-ranked ([[Splits.hashBucket]]'s engine-portable md5 form), so
 * samples are stable across runs, partitioning, and cluster size —
 * unlike `sample()`/`rand()`, whose output depends on partition layout.
 *
 * Scale shapes:
 *  - [[stratifiedTopN]] is ONE window shuffle keyed by the group
 *    column (rank within group by hash). Skew note: a mega-group sorts
 *    within one partition — for quota sampling with n << group size,
 *    pre-filtering by a hash-bucket upper bound first (cheap map) cuts
 *    the sorted volume.
 *  - [[byRates]] is a pure per-row filter expression — codegen, no
 *    shuffle, pushdown-friendly. Rates are a broadcast-free literal
 *    CASE over the (small) group domain.
 */
object Sample {

  /** Deterministic stratified sample: the `n` rows of each group with
    * the smallest md5-rank (ties broken by id). A per-source quota —
    * every group contributes at most `n` rows, chosen stably. */
  def stratifiedTopN(df: DataFrame, groupCol: String, idCol: String,
                     n: Int): DataFrame = {
    require(n > 0, "sample size must be positive")
    rankedWithinGroup(df, groupCol,
      Seq(Splits.hashBucket(col(idCol), 1 << 30).asc, col(idCol).asc),
      n, "stratifiedTopN").drop("__rank")
  }

  /** Shared k-per-group window body for [[stratifiedTopN]] and
    * [[topKPerGroup]] — ONE policy for the reserved name, the window
    * shape, and the WindowGroupLimit pruning, so the two quota rules
    * cannot diverge. Returns the filtered frame WITH the `__rank`
    * column (callers drop or rename it). */
  private def rankedWithinGroup(df: DataFrame, groupCol: String,
                                order: Seq[Column], k: Int,
                                opName: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(!df.columns.contains("__rank"),
      s"input column __rank collides with $opName's reserved temp name")
    val w = Window.partitionBy(col(groupCol)).orderBy(order: _*)
    df.withColumn("__rank", row_number().over(w))
      .where(col("__rank") <= k)
  }

  /**
   * Solve per-source sampling rates for a target mixture: given each
   * source's available token (or row) count and the desired mixture
   * weights, return the [[byRates]] map that realizes the LARGEST
   * corpus achieving those proportions without upsampling (no rate
   * above 1.0 — repetition is a training-config decision, not a
   * sampling one). The binding source is the one with the smallest
   * available/weight ratio; it samples at 1.0 and every other source
   * scales down proportionally.
   *
   * Driver-side arithmetic over the (tiny) source domain — compose
   * with [[byRates]] for the actual filter. Sources present in
   * `available` but absent from `weights` get rate 0 (excluded);
   * weights for unavailable sources are an error.
   */
  def ratesForMixture(available: Map[String, Long],
                      weights: Map[String, Double]): Map[String, Double] = {
    require(weights.nonEmpty, "mixture weights must be non-empty")
    weights.foreach { case (g, w) =>
      require(w > 0, s"weight for '$g' must be positive")
      require(available.get(g).exists(_ > 0),
        s"mixture weights name source '$g' with no available rows")
    }
    val totalW = weights.values.sum
    // scale = corpus size that makes the binding source sample at 1.0
    val scale = weights.map { case (g, w) =>
      available(g) / (w / totalW)
    }.min
    available.map { case (g, _) =>
      // the binding source's algebraic rate is exactly 1.0 but
      // x*(a/x)/a can land a few ulps above it in floating point —
      // clamp so the documented "no rate above 1.0" contract holds
      // exactly for every consumer, not just the clamping byRates
      g -> weights.get(g)
        .map(w => math.min(1.0, (w / totalW) * scale / available(g)))
        .getOrElse(0.0)
    }
  }

  /**
   * Temperature-flattened source mixing — the multilingual/multi-source
   * rebalancing standard (exponents 0.3–0.7 in practice): target share
   * of source i ∝ share_i^alpha, realized as the largest feasible
   * mixture with no upsampling (the binding source keeps rate 1.0).
   * alpha < 1 flattens toward uniform (rare sources keep more), 1 is
   * the identity (every rate 1.0), > 1 sharpens toward the head.
   *
   * Arithmetic is deliberately ORDER-FREE — rate_i = min(1, w_i *
   * min_j(n_j / w_j) / n_i) with w_i = (n_i / total)^alpha — so no
   * floating-point summation of weights whose order could differ
   * between engines or runs; `total` is an exact integer sum. Same
   * driver-side tiny-domain contract as [[ratesForMixture]]; compose
   * with [[byRates]] for the actual filter.
   *
   * Rates are rounded to 12 decimals (half-up, the same rule SQL
   * engines apply in `round(x, 12)`) before the final clamp: JVM
   * `math.pow` and a SQL engine's `power()` may disagree in the last
   * ulp, and an unrounded rate sitting within an ulp of a
   * `byRates` 10^4-bucket boundary would let that ulp flip the
   * cutoff — desyncing n_kept between engines. 12 decimals is far
   * below any meaningful rate resolution and far above double noise,
   * so both engines land on the same bucket count; an oracle replay
   * must apply the same `round(rate, 12)` before deriving its cutoff.
   */
  def ratesForTemperature(available: Map[String, Long],
                          alpha: Double): Map[String, Double] = {
    require(alpha > 0, "alpha must be positive")
    require(available.nonEmpty, "available must be non-empty")
    available.foreach { case (g, n) =>
      require(n > 0, s"available count for '$g' must be positive") }
    val total = available.values.sum
    val w = available.map { case (g, n) =>
      g -> math.pow(n.toDouble / total, alpha) }
    val minRatio = available.map { case (g, n) => n / w(g) }.min
    // floor(x*1e12 + 0.5)/1e12 = round-half-away for positive x, the
    // same rule as DuckDB/Spark round(x, 12)
    def r12(v: Double): Double = math.floor(v * 1e12 + 0.5) / 1e12
    available.map { case (g, n) =>
      g -> math.min(1.0, r12(w(g) * minRatio / n)) }
  }

  /** One source's share of a multi-epoch plan: `full` whole passes
    * over the source plus a deterministic `fracRate` sample for the
    * fractional remainder. */
  final case class EpochSpec(full: Int, fracRate: Double)

  /**
   * Multi-epoch data recipe — the REPETITION-aware complement to
   * [[ratesForMixture]] (which forbids upsampling): given per-source
   * available token counts, mixture weights, and a TOTAL token
   * budget, how many times does each source repeat? Data-constrained
   * scaling (Muennighoff et al. 2023) shows a few epochs of a scarce
   * source are near-as-good as fresh data, so production recipes
   * repeat small high-value sources rather than shrink the budget —
   * bounded by `maxEpochs`, past which repetition stops paying.
   *
   *   target_i = budget · w_i / Σw
   *   epochs_i = min(maxEpochs, target_i / avail_i)
   *   full_i   = ⌊epochs_i⌋;  fracRate_i = epochs_i − full_i
   *
   * Driver arithmetic over the (tiny) source domain, like
   * [[ratesForMixture]]. The fractional rate is quantized to 12
   * decimals ([[ratesForTemperature]]'s cross-engine cutoff contract).
   * A budget whose per-source target exceeds maxEpochs·avail simply
   * caps (the plan under-delivers, visibly — epochs_i == maxEpochs);
   * choosing a feasible budget is the caller's call, not a hidden
   * renormalization. Compose with [[materializeEpochs]].
   */
  def epochPlan(available: Map[String, Long], weights: Map[String, Double],
                budgetTokens: Long, maxEpochs: Double = 4.0)
      : Map[String, EpochSpec] = {
    require(budgetTokens > 0, "budget must be positive")
    require(maxEpochs > 0, "maxEpochs must be positive")
    require(weights.nonEmpty, "mixture weights must be non-empty")
    weights.foreach { case (g, w) =>
      require(w > 0, s"weight for '$g' must be positive")
      require(available.get(g).exists(_ > 0),
        s"mixture weights name source '$g' with no available tokens")
    }
    // deterministic summation order: the oracle replays this exact
    // fold, and float addition is order-sensitive
    val totalW = weights.toSeq.sortBy(_._1).map(_._2).sum
    def r12(v: Double): Double = math.floor(v * 1e12 + 0.5) / 1e12
    weights.map { case (g, w) =>
      val target = budgetTokens.toDouble * w / totalW
      val epochs = math.min(maxEpochs, target / available(g))
      val full = math.floor(epochs).toInt
      g -> EpochSpec(full, r12(epochs - full))
    }
  }

  /**
   * Apply an epoch plan: every row of source g appears
   * `full_g` times plus once more when its md5 bucket falls under the
   * fractional-rate cutoff ([[byRates]]' 10^4-bucket rule — the SAME
   * rows repeat in every run, so two trainings of the same recipe see
   * the same corpus). Output adds an `epoch` column (1-based copy
   * index) so downstream shard assignment can decorrelate the copies
   * ([[Splits.shardOrder]] keyed on (id, epoch)); sources absent from
   * the plan are dropped.
   *
   * Scale shape: a literal CASE over the source domain picks each
   * row's copy count, `explode(sequence(...))` fans it out map-side —
   * no shuffle, no join; a count(*) downstream sees exactly
   * Σ_g (full_g·n_g + |{hash<frac_g}|) rows.
   */
  def materializeEpochs(df: DataFrame, groupCol: String, idCol: String,
                        plan: Map[String, EpochSpec]): DataFrame = {
    require(!df.columns.contains("epoch"),
      "input column epoch collides with materializeEpochs' output column")
    plan.foreach { case (g, s) =>
      require(s.full >= 0 && s.fracRate >= 0.0 && s.fracRate <= 1.0,
        s"invalid epoch spec for '$g': $s") }
    def cut(r: Double): Int =
      math.round(math.max(0.0, math.min(1.0, r)) * 10000).toInt
    val bucket = Splits.hashBucket(col(idCol), 10000)
    val copies = plan.toSeq.sortBy(_._1).foldRight(lit(0): Column) {
      case ((g, s), rest) =>
        when(col(groupCol) === g,
          lit(s.full) + when(bucket < cut(s.fracRate), 1).otherwise(0))
          .otherwise(rest)
    }
    // sequence(1, 0) would DESCEND to [1, 0] — rows with zero copies
    // must explode an empty array, not a backwards range
    df.withColumn("epoch", explode(
      when(copies >= 1, sequence(lit(1), copies))
        .otherwise(array().cast("array<int>"))))
  }

  /** Keep each group's rows at or above the group's own `p`-quantile
    * of `scoreCol` — the "top X% by quality per source" gate
    * (FineWeb-style percentile filtering), generalized to any score.
    *
    * Scale shape: ONE hash aggregate over narrow (group, score) pairs
    * computes the per-group exact interpolated percentile, the (tiny —
    * one row per group) threshold frame broadcasts back, and the gate
    * itself is a map-side filter. No window function, no sort of the
    * corpus. At extreme group cardinality swap `percentile` for
    * `approx_percentile` (t-digest, mergeable) — same contract,
    * bounded error. */
  def aboveGroupQuantile(df: DataFrame, groupCol: String,
                         scoreCol: String, p: Double): DataFrame = {
    require(p > 0.0 && p < 1.0, "quantile must be in (0, 1)")
    val clash = df.columns.toSet.intersect(Set("__gq", "__thr"))
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with aboveGroupQuantile's reserved names")
    val thr = df.groupBy(col(groupCol))
      .agg(percentile(col(scoreCol), lit(p)).as("__thr"))
      .withColumnRenamed(groupCol, "__gq")
    // null-safe join, same contract as standardizeWithinGroup: a NULL
    // group is a legitimate group and gates against its own quantile
    // instead of being silently dropped by null-unsafe equality
    df.join(broadcast(thr), col(groupCol) <=> col("__gq"))
      .where(col(scoreCol) >= col("__thr"))
      .drop("__gq", "__thr")
  }

  /** Top-k rows per group by a score (ties → smallest tiebreak value)
    * — per-group ranking as an operator, vs the battery's global
    * top-k. Spark 4 compiles the rank filter to partial+final
    * `WindowGroupLimit`: each map task forwards at most k rows per
    * group BEFORE the exchange, so a hot group ships per-task top-k
    * candidates, never its full membership. */
  def topKPerGroup(df: DataFrame, groupCol: String, scoreCol: String,
                   tiebreakCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    require(!df.columns.contains("rank"),
      "input column rank collides with topKPerGroup's output column")
    rankedWithinGroup(df, groupCol,
      Seq(col(scoreCol).desc, col(tiebreakCol).asc), k, "topKPerGroup")
      .withColumnRenamed("__rank", "rank")
  }

  /** Rank-based score calibration within group: `percent_rank` over
    * the deterministic total order (scoreCol asc, tiebreak asc) — the
    * robust complement to [[standardizeWithinGroup]] when score
    * distributions differ in SHAPE, not just scale, across sources
    * (z-scores assume comparable spread; rank percentiles do not).
    * Ties rank DISTINCTLY via the tiebreak — a fractional tie-average
    * would depend on group-internal layout and desync cross-engine.
    *
    * Scale note: calibration needs every row ranked, so this is one
    * full window shuffle keyed by the group — one task sorts the
    * LARGEST group (a majority-English corpus puts half the rows in
    * one task at 100x). Reach for this form only when distinct
    * per-row ranks are contractually required; the corpus-scale
    * calibration is [[percentileRankByBucket]], which never sorts
    * rows at all. */
  def percentileRankWithinGroup(df: DataFrame, groupCol: String,
                                scoreCol: String, tiebreakCol: String,
                                outCol: String = "pct_rank"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(!df.columns.contains(outCol),
      s"input column $outCol collides with percentileRankWithinGroup's output")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).asc, col(tiebreakCol).asc)
    df.withColumn(outCol, round(percent_rank().over(w), 6))
  }

  /** Rank-percentile calibration that SCALES: `percent_rank()` with
    * RANK (tie-min) semantics over the score quantized to an integer
    * bucket domain — `pct = #{rows in group with strictly smaller
    * bucket} / (n_group - 1)` — computed as a decomposed prefix sum
    * ([[Budget]]'s pattern) instead of a per-group corpus window:
    *
    *  1. ONE hash aggregate to per-(group, bucket) counts — partial
    *     map-side, state bounded by groups x (scale+1) buckets;
    *  2. a running sum ordered by bucket over that AGGREGATED frame
    *     (tiny — the window sorts bucket counts, never corpus rows);
    *  3. the cumulative table broadcasts back and every row looks its
    *     percentile up map-side.
    *
    * No corpus shuffle, no skewed-key sort: a majority-English corpus
    * costs the same as a uniform one. Bit-equal to
    * `round(percent_rank() OVER (PARTITION BY group ORDER BY bucket),
    * 6)` (OpsSpec pins it against the window form), and engine-
    * portable — an oracle replays it as that exact window. Ties share
    * the tie-min percentile (the shape-free calibration contract;
    * [[percentileRankWithinGroup]] is the distinct-ties variant when a
    * total order matters more than scale). Quantization is LOSSLESS
    * whenever the score is already rounded coarser than `1/scale`
    * (e.g. the 3-decimal [[graft.ops.TextStats.qualityScore]] at
    * scale=1000); otherwise it is the documented granularity floor. A
    * NULL score calibrates to NULL (explicitly, rather than
    * inheriting either engine's null-ordering convention); a NULL
    * group is a legitimate group (null-safe join back). Single-row
    * (and single-bucket) groups score 0.0, matching percent_rank.
    *
    * Cost note: the input projection is evaluated on BOTH branches
    * (bucket counts and the map-side probe) — if the score is an
    * expensive expression (regex kernels), persist the scored frame
    * upstream; at small scale the single-sort window form can be
    * faster, the crossover is where one group's sort stops fitting
    * one task. */
  def percentileRankByBucket(df: DataFrame, groupCol: String,
                             scoreCol: String, outCol: String = "pct_rank",
                             scale: Int = 10000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(scale >= 1, "scale must be >= 1")
    val clash = df.columns.toSet
      .intersect(Set("__b", "__bg", "__cb", "__below", "__n", outCol))
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with percentileRankByBucket's names")
    val rows = df.withColumn("__b",
      round(col(scoreCol) * scale, 0).cast("long"))
    val counts = rows.where(col("__b").isNotNull)
      .groupBy(col(groupCol).as("__bg"), col("__b").as("__cb"))
      .agg(count(lit(1)).as("__cnt"))
    // both windows run over the (group x bucket) COUNT frame, whose
    // row count is bounded by the bucket domain — not the corpus
    val below = Window.partitionBy(col("__bg")).orderBy(col("__cb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = counts
      .select(col("__bg"), col("__cb"),
        coalesce(sum(col("__cnt")).over(below), lit(0L)).as("__below"),
        sum(col("__cnt")).over(Window.partitionBy(col("__bg"))).as("__n"))
    rows.join(broadcast(cum),
        col(groupCol) <=> col("__bg") && col("__b") === col("__cb"), "left")
      .withColumn(outCol,
        when(col("__b").isNull, lit(null).cast("double"))
          .when(col("__n") <= 1, lit(0.0))
          .otherwise(round(col("__below").cast("double") / (col("__n") - lit(1L)), 6)))
      .drop("__b", "__bg", "__cb", "__below", "__n")
  }

  /** Per-group quantile SUMMARY on the quantized score domain — the
    * monitoring panel (p25/p50/p75/p95 per source/language) at corpus
    * scale. Spark's exact `percentile` aggregate buffers every value
    * of a group in one aggregation state (fine for the gate family's
    * single threshold at moderate groups, a driver/executor-memory
    * cliff on a billion-row group); this form reuses
    * [[percentileRankByBucket]]'s decomposition — ONE
    * (group, bucket) hash aggregate with state bounded by
    * groups x (scale+1), a prefix sum over the tiny bucket frame,
    * then `quantile q = smallest bucket value whose cumulative count
    * reaches ceil(q·n)` (percentile_disc semantics on the bucketed
    * score). The rank comparison is PURE INTEGER arithmetic — with q
    * quantized to basis points, `cum >= ceil(q_bp·n/10000)` rewrites
    * division-free as `cum·10000 >= q_bp·n` (longs; no float ulp can
    * flip a rank cross-engine, no integer-division dialect quirks)
    * and an oracle replays the whole construction verbatim. Output is long-form
    * `(group, q, value)`, value = bucket/scale (quantization floor =
    * 1/scale; LOSSLESS when the score is pre-rounded coarser). NULL
    * scores are ignored (they carry no rank); an all-NULL group
    * vanishes — same contract as an aggregate over no rows. */
  def groupQuantilesByBucket(df: DataFrame, groupCol: String,
                             scoreCol: String,
                             qs: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.95),
                             scale: Int = 10000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(scale >= 1, "scale must be >= 1")
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      "quantiles must be in (0, 1]")
    val clash = df.columns.toSet
      .intersect(Set("__b", "__qg", "__cnt", "__cum", "__n", "q", "value"))
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with groupQuantilesByBucket's names")
    val qBps = qs.map(q => math.round(q * 10000).toInt).distinct.sorted
    val counts = df
      .withColumn("__b", round(col(scoreCol) * scale, 0).cast("long"))
      .where(col("__b").isNotNull)
      .groupBy(col(groupCol).as("__qg"), col("__b"))
      .agg(count(lit(1)).as("__cnt"))
    // both windows run over the bucket-count frame, never corpus rows
    val cum = counts
      .select(col("__qg"), col("__b"),
        sum(col("__cnt")).over(Window.partitionBy(col("__qg"))
          .orderBy(col("__b"))
          .rowsBetween(Window.unboundedPreceding, 0)).as("__cum"),
        sum(col("__cnt")).over(Window.partitionBy(col("__qg"))).as("__n"))
    // ONE pass for every requested quantile: the tiny cum frame fans
    // out by the quantile list (explode of a literal array — bucket
    // rows x |qs|, still metadata-sized), each row keeps the
    // quantiles whose rank it reaches, min(bucket) per (group, q).
    // A per-quantile filter+agg branch instead would recompute the
    // corpus aggregate once PER QUANTILE (Spark unions don't share
    // subtrees) — 4 corpus scans for the default panel.
    cum
      .select(col("__qg"), col("__b"), col("__cum"), col("__n"),
        explode(array(qBps.map(b => lit(b.toLong)): _*)).as("__bp"))
      // cum >= ceil(bp*n/10000)  <=>  cum*10000 >= bp*n  (integers)
      .where(col("__cum") * lit(10000L) >= col("__bp") * col("__n"))
      .groupBy(col("__qg"), col("__bp"))
      .agg(min(col("__b")).as("__qb"))
      .select(col("__qg").as(groupCol),
        (col("__bp").cast("double") / lit(10000.0)).as("q"),
        round(col("__qb").cast("double") / scale,
          math.ceil(math.log10(scale)).toInt + 1).as("value"))
  }

  /** Within-group z-score standardization: `z = (x - μ_g) / σ_g`
    * (population σ; a zero-variance group scores 0) — makes scores
    * comparable ACROSS sources before a global gate, so one source's
    * scale cannot dominate a mixed threshold. Same shape as
    * [[aboveGroupQuantile]]: one narrow (group, μ, σ) aggregate
    * broadcasts back, the standardization itself is map-side — no
    * window, no corpus sort. 3-decimal rounding (float-sum ulp
    * contract, as graft.ops.TextStats.qualityScore). */
  def standardizeWithinGroup(df: DataFrame, groupCol: String,
                             scoreCol: String,
                             zCol: String = "z"): DataFrame = {
    val clash = df.columns.toSet.intersect(Set("__grp", "__mu", "__sd", zCol))
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with standardizeWithinGroup's names")
    val stats = df.groupBy(col(groupCol)).agg(
      avg(col(scoreCol)).as("__mu"),
      stddev_pop(col(scoreCol)).as("__sd"))
      .withColumnRenamed(groupCol, "__grp")
    // null-safe join: a NULL group is a legitimate group (missing
    // source tag) and its rows must come back ANNOTATED, not silently
    // dropped by null-unsafe equality
    df.join(broadcast(stats), col(groupCol) <=> col("__grp"), "left")
      .withColumn(zCol,
        when(col("__sd") > 0,
          round((col(scoreCol) - col("__mu")) / col("__sd"), 3))
          .otherwise(lit(0.0)))
      .drop("__grp", "__mu", "__sd")
  }

  /** Within-group winsorization: clip `valueCol` into its group's
    * exact [pLo, pHi] percentile band — the outlier treatment for
    * quality/length/score columns before aggregate statistics, so a
    * handful of pathological rows can't drag a source's profile. Same
    * shape as [[aboveGroupQuantile]]: one narrow (group, lo, hi)
    * aggregate broadcasts back, the clip itself is map-side
    * `least(greatest(...))` — no window, no corpus sort. Exact
    * percentiles (linear interpolation, quantile_cont parity); at
    * 100 TB swap in `approx_percentile` at a documented error bound.
    * Output adds `<valueCol>_winsorized`; other columns pass through. */
  def winsorizeWithinGroup(df: DataFrame, groupCol: String,
                           valueCol: String, pLo: Double,
                           pHi: Double): DataFrame = {
    require(0.0 <= pLo && pLo < pHi && pHi <= 1.0,
      s"need 0 <= pLo < pHi <= 1, got ($pLo, $pHi)")
    val outCol = s"${valueCol}_winsorized"
    val clash = df.columns.toSet.intersect(Set("__wg", "__lo", "__hi", outCol))
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with winsorizeWithinGroup's names")
    val thr = df.groupBy(col(groupCol)).agg(
      percentile(col(valueCol), lit(pLo)).as("__lo"),
      percentile(col(valueCol), lit(pHi)).as("__hi"))
      .withColumnRenamed(groupCol, "__wg")
    // null-safe join, same contract as standardizeWithinGroup
    df.join(broadcast(thr), col(groupCol) <=> col("__wg"), "left")
      .withColumn(outCol,
        least(greatest(col(valueCol), col("__lo")), col("__hi")))
      .drop("__wg", "__lo", "__hi")
  }

  /** Exact-size deterministic global sample: the `n` rows with the
    * smallest engine-portable hash rank ([[Splits.hashBucket]] md5
    * form; ties broken by id). Unlike `df.sample(fraction)` this
    * yields EXACTLY n rows and the same n rows regardless of
    * partitioning, cluster size, or run — the "take exactly N docs
    * uniformly" request a pipeline makes when sizing an eval slice.
    *
    * Scale shape: orderBy+limit compiles to TakeOrderedAndProject —
    * a bounded size-n heap per partition and a driver merge of
    * n·partitions candidates. The corpus is never exchanged and never
    * globally sorted; contrast with a rank window, which would
    * shuffle everything to order it. */
  def exactGlobalSample(df: DataFrame, idCol: String, n: Int,
                        rankCol: String = "rnk"): DataFrame = {
    require(n > 0, "sample size must be positive")
    require(!df.columns.contains(rankCol),
      s"input column $rankCol collides with exactGlobalSample's rank column")
    df.withColumn(rankCol, Splits.hashBucket(col(idCol), 1 << 30))
      .orderBy(col(rankCol).asc, col(idCol).asc)
      .limit(n)
  }

  /** Per-group cap with overflow accounting — the "at most k documents
    * per domain" rule crawl curation applies before mixing, reported as
    * a per-group summary: total seen, kept, dropped, kept token volume,
    * and the quality floor the cap induced (min kept score — what a
    * document now needs to beat to enter that group).
    *
    * Scale shape: the kept side is [[topKPerGroup]]'s window (ONE
    * shuffle keyed by the group; WindowGroupLimit prunes to k rows per
    * group map-side before the exchange), the totals side is a narrow
    * count aggregate, and both summaries join on the (small) group
    * domain — broadcast-sized by construction. The corpus is scanned
    * twice but never leaves its executors unranked.
    */
  def capPerGroupSummary(df: DataFrame, groupCol: String, scoreCol: String,
                         tiebreakCol: String, tokenCol: String,
                         k: Int): DataFrame = {
    require(k > 0, "cap must be positive")
    require(!df.columns.contains("__cg"),
      "input column __cg collides with capPerGroupSummary's reserved temp name")
    val kept = rankedWithinGroup(df, groupCol,
      Seq(col(scoreCol).desc, col(tiebreakCol).asc), k, "capPerGroupSummary")
    val keptAgg = kept.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n_kept"),
      sum(col(tokenCol).cast("long")).as("kept_tokens"),
      round(min(col(scoreCol)), 3).as("quality_floor"))
    val totalAgg = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_total"))
      .withColumnRenamed(groupCol, "__cg")
    // null-safe: a NULL group is a legitimate group and must be
    // accounted, same contract as standardizeWithinGroup
    totalAgg.join(keptAgg, col("__cg") <=> col(groupCol), "left")
      .select(col("__cg").as(groupCol), col("n_total"), col("n_kept"),
        (col("n_total") - col("n_kept")).as("n_dropped"),
        col("kept_tokens"), col("quality_floor"))
  }

  /** Largest-remainder proportional allocation: integer per-group
    * quotas that sum EXACTLY to `total` and track each group's share
    * as closely as integers allow — the allocation [[byRates]]'
    * per-row rate cutoffs cannot give (rates keep proportions only in
    * expectation; a fixed eval budget needs exact counts). Floors of
    * the ideal shares first, then the leftover units go to the
    * largest fractional remainders (ties break on the group name, so
    * the allocation is deterministic and SQL-replayable). Driver
    * arithmetic over the (small) group domain, like
    * [[ratesForMixture]]. */
  def proportionalQuotas(counts: Map[String, Long],
                         total: Long): Map[String, Long] = {
    require(counts.nonEmpty && counts.values.forall(_ >= 0),
      "counts must be non-negative")
    val n = counts.values.sum
    require(total >= 0 && total <= n,
      s"total $total outside [0, $n] — cannot allocate more than exists")
    if (n == 0) return counts.map { case (g, _) => g -> 0L }
    // ideal shares in BigInt: total * c overflows a Long once both
    // total and the group counts are corpus-sized (billions x
    // billions), silently corrupting floors AND the remainder ranking
    val floors = counts.map { case (g, c) =>
      g -> (BigInt(total) * BigInt(c) / BigInt(n)).toLong
    }
    val leftover = (total - floors.values.sum).toInt
    val byRemainder = counts.toSeq
      .map { case (g, c) => (g, BigInt(total) * BigInt(c) % BigInt(n)) }
      .sortBy { case (g, rem) => (-rem, g) }
      .take(leftover).map(_._1).toSet
    floors.map { case (g, f) =>
      g -> (f + (if (byRemainder.contains(g)) 1L else 0L))
    }
  }

  /** The quota lookup as a literal CASE over the group domain —
    * broadcast-free, codegen; groups absent from `quotas` get 0. ONE
    * implementation so the sampler and any report replaying the
    * allocation (q126) cannot diverge. */
  def quotaCase(groupCol: String, quotas: Map[String, Long]): Column =
    quotas.toSeq.sortBy(_._1)
      .foldRight(lit(0L)) { case ((g, q), rest) =>
        when(col(groupCol) === g, lit(q)).otherwise(rest)
      }

  /** Deterministic stratified sample hitting EXACT per-group quotas
    * (md5-ranked within group, ties by id — [[stratifiedTopN]]'s rule
    * with a per-group k). The quota lookup is a literal CASE over the
    * group domain ([[quotaCase]]); groups absent from `quotas`
    * contribute nothing. */
  def stratifiedByQuotas(df: DataFrame, groupCol: String, idCol: String,
                         quotas: Map[String, Long]): DataFrame = {
    require(quotas.nonEmpty, "quotas must be non-empty")
    val maxQ = quotas.values.max
    require(maxQ <= Int.MaxValue,
      s"per-group quota $maxQ exceeds Int.MaxValue — the rank filter " +
        "would silently truncate; split the stratum or raise the rank type")
    if (maxQ == 0) return df.limit(0)
    val quotaExpr = quotaCase(groupCol, quotas)
    rankedWithinGroup(df, groupCol,
      Seq(Splits.hashBucket(col(idCol), 1 << 30).asc, col(idCol).asc),
      maxQ.toInt, "stratifiedByQuotas")
      .where(col("__rank") <= quotaExpr)
      .drop("__rank")
  }

  /** Score-weighted deterministic sampling: keep each row with
    * probability equal to its score in [0, 1] — the SOFT quality
    * filter (a 0.9 doc almost always survives, a 0.3 doc rarely does)
    * that preserves distribution tails a hard threshold would
    * truncate. Same engine-portable md5 buckets as [[byRates]], so
    * the sample is stable across runs/partitioning and an oracle can
    * replay membership row by row. Pure codegen filter — no shuffle,
    * pushdown-friendly. Scores are effectively quantized to 1e-4
    * (bucket granularity); null or negative scores keep nothing,
    * scores ≥ 1 keep everything. */
  def byScore(df: DataFrame, idCol: String, scoreCol: String): DataFrame =
    df.where(Splits.hashBucket(col(idCol), 10000) <
      round(col(scoreCol) * 10000, 0).cast("long"))

  /** Rate-based source mixing: keep each row with its group's rate
    * (exactly the rows whose per-id hash bucket falls under
    * rate x 10000 — deterministic, not probabilistic). Groups absent
    * from `rates` use `defaultRate`. Rates are clamped to [0, 1]. */
  def byRates(df: DataFrame, groupCol: String, idCol: String,
              rates: Map[String, Double],
              defaultRate: Double = 1.0): DataFrame = {
    // round, don't truncate: 0.57 * 10000 is 5699.999... in binary and
    // a floor would silently drop one bucket below the documented
    // rate x 10000 cutoff for most non-representable decimal rates
    def cut(r: Double): Int =
      math.round(math.max(0.0, math.min(1.0, r)) * 10000).toInt
    val bucket = Splits.hashBucket(col(idCol), 10000)
    val cutoff = rates.toSeq.sortBy(_._1).foldRight(lit(cut(defaultRate))) {
      case ((g, r), rest) => when(col(groupCol) === g, cut(r)).otherwise(rest)
    }
    df.where(bucket < cutoff)
  }
}
