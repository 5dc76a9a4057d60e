package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Per-column data-quality profiling — the monitoring report an ingest
 * pipeline records per batch (null rates, cardinalities, value ranges)
 * to catch schema drift and upstream corruption before training jobs
 * consume the data. Extension surface beyond the reference (whose
 * column-role detection samples; this profiles exhaustively).
 *
 * Scale design: ONE logical pass — all per-column aggregates ride in a
 * single `agg` (partial+final, map-side combine), and the single
 * result row explodes driver-free into one output row per column.
 * Distinct counts default to `approx_count_distinct` (HLL — mergeable,
 * constant memory, the only sane choice at 100 TB); `exactDistinct =
 * true` switches to exact `count(DISTINCT ...)` for oracle checking
 * and small batches (Spark expands multi-distinct aggregates — cost
 * grows with the column count).
 */
object Profile {

  /** Equi-depth histogram of a numeric column: `bins` buckets holding
    * (approximately) equal row counts, cut at the exact interpolated
    * k/bins percentiles — the distribution profile that stays readable
    * when the data is skewed (an equi-WIDTH histogram of a Zipf
    * column puts everything in bin 0). Returns
    * (bin, n_rows, lo, hi) — lo/hi are the bin's observed min/max.
    *
    * Scale shape: one exact multi-percentile aggregate (single row)
    * collects the bins-1 boundaries to the driver — a bounded collect
    * of doubles; bin assignment is a literal codegen CASE chain
    * (count of boundaries strictly below the value), map-side; the
    * report is one hash aggregate on the ≤bins-key domain. Ties at a
    * boundary all land on the same side (strict `>`), so discrete
    * columns may leave some bins empty rather than split a value. */
  def equiDepthHistogram(df: DataFrame, valueCol: String,
                         bins: Int): DataFrame = {
    require(bins > 1, "need at least two bins")
    // nulls out up front: percentile() already ignores them when
    // cutting boundaries, but `v > bound` is null for a null v, so
    // without this filter every null row would silently land in bin 0
    // — inflating its count while the boundaries never saw the nulls
    val vals = df.where(col(valueCol).isNotNull)
    val qs = (1 until bins).map(_.toDouble / bins)
    val boundsRow = vals
      .agg(percentile(col(valueCol),
        array(qs.map(lit): _*)).as("__b"))
      .head
    // empty / all-null input: no boundaries — an empty report, not an NPE
    if (boundsRow.isNullAt(0)) {
      val spark = df.sparkSession
      import spark.implicits._
      return Seq.empty[(Long, Long, Double, Double)]
        .toDF("bin", "n_rows", "lo", "hi")
        .select(col("bin"), col("n_rows"),
          col("lo").cast(df.schema(valueCol).dataType),
          col("hi").cast(df.schema(valueCol).dataType))
    }
    val bounds: Seq[Double] = boundsRow.getSeq[Double](0)
    val binCol = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col(valueCol) > lit(b), 1).otherwise(0)
    }
    vals.withColumn("bin", binCol.cast("long"))
      .groupBy("bin").agg(
        count(lit(1)).as("n_rows"),
        min(col(valueCol)).as("lo"),
        max(col(valueCol)).as("hi"))
      .orderBy("bin")
  }

  /** Unigram-distribution drift between two corpus versions: add-one-
    * smoothed KL(v2 ‖ v1) over the union vocabulary, plus the sizes
    * that contextualize it — the release-gate metric that catches a
    * DISTRIBUTION shift (one source's crawl broke, a language
    * vanished) that row-level diffing ([[graft.ops.Diff]]) cannot see.
    *
    * Cross-engine contract: per-term contributions round to e12
    * fixed-point longs and SUM AS INTEGERS — a float sum's value
    * depends on reduction order; ln() ulp wobble (~1e-16 relative) is
    * far below the e12 grain, so both engines produce identical
    * sums. The three scalar totals (vocab size, token counts) are
    * bounded driver collects baked into the expression as literals so
    * the arithmetic matches the SQL replay operation for operation.
    *
    * Scale shape: two (word, count) hash aggregates + ONE full-outer
    * join on the word key + one scalar aggregate; nothing else
    * shuffles. */
  def unigramDrift(v1: DataFrame, v2: DataFrame,
                   textCol: String): DataFrame = {
    def counts(df: DataFrame): DataFrame = df
      .select(explode(split(Dedup.normalized(col(textCol)), " ")).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))
    val c1 = counts(v1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val c2 = counts(v2)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val joined = c1.select(col("w"), col("c").as("a"))
      .join(c2.select(col("w"), col("c").as("b")), Seq("w"), "full_outer")
      .select(coalesce(col("a"), lit(0L)).as("a"),
        coalesce(col("b"), lit(0L)).as("b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vs = joined.count()
    // coalesce: sum() over an EMPTY count frame is null (an empty or
    // all-whitespace corpus version is legal input — smoothing handles
    // a zero-token side fine)
    val n1 = c1.agg(coalesce(sum(col("c")), lit(0L))).head.getLong(0)
    val n2 = c2.agg(coalesce(sum(col("c")), lit(0L))).head.getLong(0)
    val q = (col("b") + lit(1.0)) / lit((n2 + vs).toDouble)
    val p = (col("a") + lit(1.0)) / lit((n1 + vs).toDouble)
    val out = joined
      .select(round(q * log(q / p) * lit(1e12), 0).cast("long").as("e"))
      .agg(sum(col("e")).as("__s"))
      .select(lit(vs).as("vocab"), lit(n1).as("tokens_v1"),
        lit(n2).as("tokens_v2"),
        round(col("__s") / lit(1e12), 6).as("kl_nats"))
      .localCheckpoint(true)
    joined.unpersist(); c1.unpersist(); c2.unpersist()
    out
  }

  /** One row per profiled column: (column, n_rows, n_nulls,
    * n_distinct, min_value, max_value) — min/max rendered as strings
    * so the report is schema-stable across column types. */
  def schemaReport(df: DataFrame, cols: Seq[String] = Nil,
                   exactDistinct: Boolean = false): DataFrame = {
    val cs = if (cols.nonEmpty) cols else df.columns.toSeq
    require(cs.nonEmpty, "no columns to profile")
    def nd(c: String): Column =
      if (exactDistinct) countDistinct(col(c)) else approx_count_distinct(col(c))
    val aggs: Seq[Column] = cs.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
        nd(c).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val perCol = cs.map { c =>
      struct(
        lit(c).as("column"),
        col(s"__nn_$c").as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))
    }
    row.select(col("__n").as("n_rows"), explode(array(perCol: _*)).as("__p"))
      .select(col("__p.column").as("column"), col("n_rows"),
        col("__p.n_nulls").as("n_nulls"),
        col("__p.n_distinct").as("n_distinct"),
        col("__p.min_value").as("min_value"),
        col("__p.max_value").as("max_value"))
  }

  /**
   * Order-independent content digest per group: row count plus the SUM
   * of each row's 60-bit md5 prefix over `cols` — the corpus-version
   * checksum a reproducibility pipeline records per batch ("is this
   * byte-for-byte the corpus that trained run X?"). Commutative
   * addition makes the digest independent of partitioning, task order,
   * and file layout — any two frames with equal row multisets digest
   * identically; DECIMAL(38,0) accumulation cannot overflow (2^60 x
   * row count stays far inside 38 digits at any real corpus size).
   * One partial+final hash aggregate; engine-portable by construction
   * (md5 + hex-prefix parse replay in any SQL engine).
   *
   * Nulls: concat_ws SKIPS null columns, so (null, "x") and ("x",
   * null) collide — acceptable for a drift checksum; feed explicitly
   * null-coalesced columns if that distinction matters.
   */
  def corpusDigest(df: DataFrame, groupCol: String,
                   cols: Seq[String]): DataFrame =
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        sum(rowDigest(cols.map(col))).as("digest"))

  /** The per-row 60-bit md5-prefix hash behind [[corpusDigest]],
    * exposed so other contracts (Curate's per-stage membership
    * digests) sum the exact same kernel. SQL replay:
    * `('0x' || substr(md5(concat_ws(chr(1), cols...)), 1, 15))::BIGINT`. */
  def rowDigest(cols: Seq[Column]): Column = {
    require(cols.nonEmpty, "digest needs at least one content column")
    val rowKey = concat_ws("\u0001", // 0x01 separator so ("ab","c") != ("a","bc")
      cols.map(_.cast("string")): _*)
    conv(substring(md5(rowKey.cast("binary")), 1, 15), 16, 10)
      .cast("decimal(38,0)")
  }

  /**
   * Pairwise token-vocabulary overlap between groups (sources,
   * snapshots, domains): exact Jaccard over each group's DISTINCT
   * token set — the corpus-composition diagnostic that answers "how
   * much does source A re-serve source B?" before dedup budgets are
   * set. Emits every ordered pair (a < b) including zero-overlap ones,
   * so the output is the full upper-triangle matrix.
   *
   * Scale shape: ONE explode pass collapses to distinct (group, token)
   * postings (partial aggregation dedups map-side — Zipf-head tokens
   * never fan out), persisted across its two consumers. The
   * intersection self-join is keyed on the token; per-token fan-out is
   * bounded by |groups|² — this operator is for GROUP cardinalities
   * (sources/domains/batches, tens not millions), which also makes the
   * per-group sizes a broadcast. For million-group overlap, switch to
   * MinHash signatures per group (the [[graft.ops.Dedup]] machinery)
   * instead of exact sets.
   */
  def overlapMatrix(df: DataFrame, groupCol: String,
                    textCol: String): DataFrame = {
    // NULL groups are excluded UP FRONT: every pair predicate below
    // (`__g < __g2`, `source_a < source_b`) is NULL-eliminating, so a
    // null group could never appear in a matrix row — dropping its
    // postings here keeps the sizes side consistent with the pairs
    // side instead of counting rows that no pair can reference
    val post = df.where(col(groupCol).isNotNull)
      .select(col(groupCol).as("__g"),
        explode(split(Dedup.normalized(col(textCol)), " ")).as("__w"))
      .where(col("__w") =!= "")
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // materialize the (|groups|-row) sizes once — deriving both matrix
    // sides from the lazy aggregate would re-run the full aggregate
    // scan of the cached postings per side
    val sizes = post.groupBy(col("__g")).agg(count(lit(1)).as("__n"))
      .localCheckpoint(true)
    val inter = post.join(
      post.select(col("__g").as("__g2"), col("__w")), Seq("__w"))
      .where(col("__g") < col("__g2"))
      .groupBy(col("__g"), col("__g2"))
      .agg(count(lit(1)).as("__common"))
    // full matrix: |groups|² pairs is tiny by contract — broadcast
    // cross of the sizes, zero-overlap pairs backfilled with 0
    val a = sizes.select(col("__g").as("source_a"), col("__n").as("n_a"))
    val b = sizes.select(col("__g").as("source_b"), col("__n").as("n_b"))
    val out = a.crossJoin(broadcast(b))
      .where(col("source_a") < col("source_b"))
      .join(inter.select(col("__g").as("source_a"), col("__g2").as("source_b"),
        col("__common")), Seq("source_a", "source_b"), "left")
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        coalesce(col("__common"), lit(0L)).as("n_common"),
        // long/long division — engine-portable at 4 decimals
        round(coalesce(col("__common"), lit(0L)).cast("double") /
          (col("n_a") + col("n_b") - coalesce(col("__common"), lit(0L))), 4)
          .as("jaccard"))
      .localCheckpoint(true)
    post.unpersist()
    out
  }
}
