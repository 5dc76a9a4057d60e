package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/**
 * Structured Streaming over the events table — EXTENSION surface
 * (SURVEY.md §2.11: the reference has no streaming at all; this is the
 * north-star addition, built Spark-first).
 *
 * Every transform here is expressed on a generic DataFrame with an
 * event-time `ts`, so the SAME code runs in batch (for the oracle /
 * tests) and as a `readStream` pipeline. The streaming entry points
 * wire watermarks + output modes around them.
 *
 * Scale notes: windowed aggregates are partial+final hash aggregates
 * keyed by (window, event_type) — shuffle width is bounded by
 * cardinality(windows x types), not event volume; watermarks bound
 * state size; `availableNow` triggers let the same pipeline drain a
 * backlog batch-style on a 1000-executor cluster.
 */
object EventStreams {

  /** Tumbling window aggregate (count + sum per event_type). */
  def tumbling(events: DataFrame, width: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm").as("window_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Sliding window aggregate. */
  def sliding(events: DataFrame, width: String = "1 hour",
              slide: String = "30 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm").as("window_start"),
        col("event_type"), col("n"))

  /** Session windows per user (gap-based). */
  def sessions(events: DataFrame, gap: String = "10 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
      .select(
        col("user_id"),
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(col("w.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        col("n_events"), col("sum_value"))

  /** Session concurrency curve: how many sessions are ACTIVE in each
    * fixed time slot — the capacity-planning view (peak concurrency)
    * that per-slot event counts get wrong (a session spans its whole
    * [start, end) interval even through slots where it emitted no
    * event). Sessions come from [[sessions]]' gap rule; each explodes
    * into the slots its interval covers (fan-out bounded by session
    * length / slot width), and the aggregate's key domain is the time
    * range / slot width — bounded by wall-clock span, not event
    * volume. */
  def sessionConcurrency(events: DataFrame, userCol: String,
                         gap: String = "10 minutes",
                         slotSeconds: Long = 600L): DataFrame = {
    require(slotSeconds > 0, "slot width must be positive")
    val w = slotSeconds * 1000000L
    events
      .groupBy(session_window(col("ts"), gap).as("w"), col(userCol))
      .agg(count(lit(1)).as("__n"))
      .select(unix_micros(col("w.start")).as("__st"),
        unix_micros(col("w.end")).as("__en"))
      .select(explode(sequence(
        expr(s"__st div $w"), expr(s"(__en - 1) div $w"))).as("slot"))
      .groupBy("slot").agg(count(lit(1)).as("n_active"))
      .select(col("slot"),
        date_format(timestamp_micros(col("slot") * w), "yyyy-MM-dd HH:mm")
          .as("slot_start"),
        col("n_active"))
      .orderBy("slot")
  }

  /** Windowed distribution-shift monitor: per tumbling window, the
    * event-type mix scored against a STATIC reference distribution by
    * add-one-smoothed KL divergence — the live "has the traffic mix
    * drifted" gauge (reference = last release's mix; alert when
    * `kl_drift` jumps). The reference rides the plan as literals, so
    * the whole thing is ONE stateful windowed aggregate (conditional
    * count per reference type + a map-side KL expression): it streams
    * in append mode with a watermark, state bounded by window count —
    * a per-type groupBy then a second per-window fold would be two
    * chained stateful aggregates, which append-mode streaming
    * forbids. Events outside the reference's type universe are
    * excluded (route them to a schema alert, not a drift score).
    * 3-decimal rounding: the KL term sum order differs across
    * engines. */
  def typeMixDrift(events: DataFrame, ref: Seq[(String, Double)],
                   width: String = "1 hour"): DataFrame = {
    require(ref.nonEmpty, "reference distribution must be non-empty")
    require(ref.forall(_._2 > 0), "reference shares must be positive")
    require(ref.map(_._1).distinct.length == ref.length,
      "reference types must be unique")
    val v = ref.length
    // intermediate columns are named by INDEX, not by the type value —
    // a type containing '.' or '`' must not break column resolution
    val counts = ref.zipWithIndex.map { case ((t, _), i) =>
      sum(when(col("event_type") === t, 1L).otherwise(0L)).as(s"__n_$i") }
    val total = ref.indices.map(i => col(s"__n_$i")).reduce(_ + _)
    val windowed = events
      .where(col("event_type").isin(ref.map(_._1): _*))
      .groupBy(window(col("ts"), width).as("w"))
      .agg(counts.head, counts.tail: _*)
      .withColumn("__total", total)
    val kl = ref.zipWithIndex.map { case ((_, q), i) =>
      val p = (col(s"__n_$i") + 1) / (col("__total") + v)
      p * log(p / q)
    }.reduce(_ + _)
    windowed.select(
      date_format(col("w.start"), "yyyy-MM-dd HH:mm").as("window_start"),
      col("__total").as("n_events"),
      // + 0.0 folds IEEE -0.0 (a zero-drift window rounds to -0.0
      // from below) to +0.0 for the cross-engine hash contract
      (round(kl, 3) + lit(0.0)).as("kl_drift"))
  }

  /** File-source stream wired through [[typeMixDrift]] — same single
    * stateful aggregate, so append mode emits each window's drift
    * once, when the watermark closes it. */
  def streamTypeMixDrift(spark: SparkSession, dir: String,
                         ref: Seq[(String, Double)],
                         watermark: String = "2 hours",
                         width: String = "1 hour"): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    val raw = spark.readStream.schema(schema).parquet(dir)
    typeMixDrift(nanosToTimestamp(raw).withWatermark("ts", watermark),
      ref, width)
  }

  /** Convert a long-nanos `ts` column (from
    * `spark.sql.legacy.parquet.nanosAsLong` reads) back to a timestamp.
    * MUST be integer division: `/` on columns is double division, and a
    * 61-bit nanos value loses precision in a 53-bit mantissa — ~1.5% of
    * fixture timestamps land 1 microsecond off, which would diverge
    * from the oracle on any boundary-aligned event. */
  def nanosToTimestamp(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // TIMESTAMP_MICROS with isAdjustedToUTC=0 reads as TIMESTAMP_NTZ,
      // which `unix_micros` and `withWatermark` reject. The session
      // timezone is pinned to UTC (GraftSession/SparkTestSession), so
      // casting to the instant type is wall-clock lossless.
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }

  /** File-source stream over an events parquet directory with an
    * event-time watermark; same aggregation as [[tumbling]]. */
  def streamTumbling(spark: SparkSession, dir: String,
                     watermark: String = "2 hours",
                     width: String = "1 hour"): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    val raw = spark.readStream.schema(schema).parquet(dir)
    tumbling(nanosToTimestamp(raw).withWatermark("ts", watermark), width)
  }

  /** Drain the stream to an in-memory sink once (availableNow) and
    * return the result table. Used by tests; in production the same
    * query writes to a real sink with a periodic trigger. */
  def runOnce(spark: SparkSession, streamed: DataFrame,
              tableName: String,
              mode: OutputMode = OutputMode.Complete()): StreamingQuery = {
    streamed.writeStream
      .format("memory")
      .queryName(tableName)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** File-source stream wired through [[sessions]]. Session windows
    * stream in APPEND mode only (a session's membership is open until
    * the watermark passes its gap, so there is no meaningful complete
    * mode): a session emits exactly once, when `session_end + delay`
    * falls behind the advancing watermark. The trailing open session
    * per user therefore stays in state until later data (or a no-data
    * micro-batch after the final file batch) closes it — by design;
    * tests compare against the batch [[sessions]] filtered to windows
    * the final watermark could have closed. */
  def streamSessions(spark: SparkSession, dir: String,
                     watermark: String = "0 seconds",
                     gap: String = "10 minutes"): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    val raw = spark.readStream.schema(schema).parquet(dir)
    sessions(nanosToTimestamp(raw).withWatermark("ts", watermark), gap)
  }

  /** Stream-stream interval self-join: views paired with the same
    * user's purchases that follow within `window` — the conversion-
    * attribution join running fully ON STREAMS. Both branches carry
    * watermarks and the join condition bounds both event times, which
    * is exactly what lets Spark EVICT join state (a view older than
    * watermark + window can never match again); without the interval
    * bound the state grows forever. Inner-join matches emit as soon
    * as both sides arrive, so an availableNow drain produces the
    * complete batch-equivalent result. */
  def streamIntervalJoin(spark: SparkSession, dir: String,
                         watermark: String = "2 hours",
                         window: String = "1 hour"): DataFrame =
    streamIntervalJoinOfType(spark, dir, watermark, window, "inner")

  /** [[streamIntervalJoin]] with LEFT OUTER semantics: views that see
    * NO purchase within `window` are ALSO emitted (null `p_us`) — the
    * "non-converting impressions" side a production funnel needs and
    * the inner form silently drops. An unmatched view cannot emit
    * eagerly (a matching purchase may still arrive), so Spark holds it
    * in join state and emits the null-extended row only when the
    * watermark guarantees no future purchase can match it — the same
    * state-eviction bound the interval condition already provides for
    * the inner form; the outer form adds NO state beyond it. The
    * trailing views the final watermark never strictly passed stay
    * unemitted (same contract as [[streamSessions]]' open tail); tests
    * compare against the batch left join restricted to what the final
    * watermark could have closed. */
  def streamIntervalJoinLeftOuter(spark: SparkSession, dir: String,
                                  watermark: String = "2 hours",
                                  window: String = "1 hour"): DataFrame =
    streamIntervalJoinOfType(spark, dir, watermark, window, "leftOuter")

  /** Shared plan behind the inner and left-outer interval joins — one
    * definition of the watermarks, the interval bound, and the output
    * shape, so the two join types cannot drift. */
  private def streamIntervalJoinOfType(spark: SparkSession, dir: String,
                                       watermark: String, window: String,
                                       joinType: String): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    val raw = nanosToTimestamp(spark.readStream.schema(schema).parquet(dir))
    val views = raw.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("value").as("v_value"))
      .withWatermark("v_ts", watermark)
    val purchases = raw.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", watermark)
    views.join(purchases,
      col("v_user") === col("p_user") &&
        col("p_ts") >= col("v_ts") &&
        col("p_ts") <= col("v_ts") + expr(s"INTERVAL $window"),
      joinType)
      .select(col("v_user").as("user_id"),
        unix_micros(col("v_ts")).as("v_us"),
        unix_micros(col("p_ts")).as("p_us"))
  }

  /** Top-k behavioral paths: the most common (step1, step2, step3)
    * trigrams over per-user event sequences — second-order sequence
    * mining on top of [[transitionMatrix]]'s first-order view. Two
    * stacked lags ride ONE per-user window; the trigram census
    * aggregates to the ≤|types|³ domain and the top-k compiles to
    * TakeOrderedAndProject (ties break on the path for determinism). */
  def topPaths(events: DataFrame, userCol: String, typeCol: String,
               idCol: String, k: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, "k must be positive")
    val clash = events.columns.toSet
      .intersect(Set("__us", "step1", "step2", "step3"))
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with topPaths' names")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col("__us").asc, col(idCol).asc)
    events.withColumn("__us", unix_micros(col("ts")))
      .withColumn("step1", lag(col(typeCol), 2).over(w))
      .withColumn("step2", lag(col(typeCol), 1).over(w))
      .where(col("step1").isNotNull)
      .select(col("step1"), col("step2"), col(typeCol).as("step3"))
      .groupBy("step1", "step2", "step3")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("step1").asc, col("step2").asc,
        col("step3").asc)
      .limit(k)
  }

  /** Funnel conversion latency: for the strict-order funnel semantics
    * of [[funnel]] (first occurrence of each step AFTER the previous
    * step's time), the per-user step timestamps and the percentiles
    * of the step-to-step deltas — "users convert, but how fast?".
    * Each level is one pushed-filter scan joined to the previous
    * level's (user, t) frame (the q75 level-join shape); the deltas
    * aggregate to one row. Returns (n_step1, n_step2, n_step3,
    * p50/p90 seconds for both transitions, 4 decimals). */
  def funnelLatency(events: DataFrame, userCol: String, typeCol: String,
                    steps: Seq[String]): DataFrame = {
    require(steps.length == 3, "funnelLatency reports a 3-step funnel")
    val us = unix_micros(col("ts"))
    val l1 = events.where(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(us).as("t1"))
    val l2 = events.where(col(typeCol) === steps(1))
      .select(col(userCol), us.as("__u2"))
      .join(l1, Seq(userCol))
      .where(col("__u2") >= col("t1"))
      .groupBy(col(userCol), col("t1")).agg(min(col("__u2")).as("t2"))
    val l3 = events.where(col(typeCol) === steps(2))
      .select(col(userCol), us.as("__u3"))
      .join(l2, Seq(userCol))
      .where(col("__u3") >= col("t2"))
      .groupBy(col(userCol), col("t1"), col("t2"))
      .agg(min(col("__u3")).as("t3"))
    // each transition's latency is measured over the users who
    // COMPLETED that transition (not only fully-converted users) —
    // two single-row aggregates crossed, the q50/q52 pattern
    val n1 = l1.count()
    val a2 = l2.agg(
      count(lit(1)).as("n_step2"),
      round(percentile(col("t2") - col("t1"), lit(0.5)) / lit(1000000.0), 4)
        .as("p50_s1_to_s2_s"),
      round(percentile(col("t2") - col("t1"), lit(0.9)) / lit(1000000.0), 4)
        .as("p90_s1_to_s2_s"))
    val a3 = l3.agg(
      count(lit(1)).as("n_step3"),
      round(percentile(col("t3") - col("t2"), lit(0.5)) / lit(1000000.0), 4)
        .as("p50_s2_to_s3_s"),
      round(percentile(col("t3") - col("t2"), lit(0.9)) / lit(1000000.0), 4)
        .as("p90_s2_to_s3_s"))
    a2.crossJoin(a3)
      .select(lit(n1).as("n_step1"), col("n_step2"), col("n_step3"),
        col("p50_s1_to_s2_s"), col("p90_s1_to_s2_s"),
        col("p50_s2_to_s3_s"), col("p90_s2_to_s3_s"))
  }

  /** Per-user inter-event gaps: each event annotated with the
    * microseconds since the same user's PREVIOUS event (null for the
    * user's first). The behavioral-telemetry primitive under dwell
    * time, churn-risk inactivity, and bot detection (impossibly
    * regular gaps). One window PARTITIONED BY user — distributed
    * across the user domain, never a global sort; ties at equal ts
    * break on `idCol` so the lag is deterministic. Like every
    * operator in this object, the event-time column is the `ts`
    * contract column (see the object doc) — only the identity
    * columns are parameterized. */
  def interEventGaps(events: DataFrame, userCol: String,
                     idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(!events.columns.contains("__us") && !events.columns.contains("gap_us"),
      "input columns __us/gap_us collide with interEventGaps' names")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col("__us").asc, col(idCol).asc)
    events.withColumn("__us", unix_micros(col("ts")))
      .withColumn("gap_us", col("__us") - lag(col("__us"), 1).over(w))
      .drop("__us")
  }

  /** First-order transition matrix over per-user event sequences:
    * (prev_type, next_type, count, row-conditional probability) — the
    * Markov summary behind "what do users do after X" and sequence
    * anomaly detection. The lag window distributes by user; counts
    * aggregate to the |types|² domain and the probability join is
    * broadcast-sized by construction. Event time is the object's `ts`
    * contract column, as in [[interEventGaps]]. */
  def transitionMatrix(events: DataFrame, userCol: String, typeCol: String,
                       idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val clash = events.columns.toSet
      .intersect(Set("__us", "prev_type", "next_type", "__pt", "__tot"))
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with transitionMatrix's names")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col("__us").asc, col(idCol).asc)
    val pairs = events.withColumn("__us", unix_micros(col("ts")))
      .withColumn("prev_type", lag(col(typeCol), 1).over(w))
      .where(col("prev_type").isNotNull)
      .select(col("prev_type"), col(typeCol).as("next_type"))
    val counts = pairs.groupBy("prev_type", "next_type")
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("prev_type").as("__pt"))
      .agg(sum(col("n")).as("__tot"))
    counts.join(broadcast(totals), col("prev_type") === col("__pt"))
      .select(col("prev_type"), col("next_type"), col("n"),
        round(col("n") / (col("__tot") * lit(1.0)), 4).as("prob"))
  }

  /** Streaming exact dedup on `keyCols`: first arrival wins, later
    * duplicates within the watermark horizon drop. State is bounded by
    * the watermark (keys older than the horizon are evicted — the only
    * way streaming dedup survives unbounded input; an unwatermarked
    * `dropDuplicates` would grow state forever).
    *
    * The batch branch picks a DETERMINISTIC winner — earliest `ts`,
    * remaining columns as tie-breakers — rather than `dropDuplicates`,
    * whose survivor is partition-order-dependent: with the same code
    * path serving oracle/batch comparisons, a run-to-run flap on
    * non-key columns would look like a correctness bug. Earliest-ts
    * also mirrors the streaming branch's first-arrival semantics for
    * in-order sources. One window shuffle, same as Dedup.exact. */
  def dedup(events: DataFrame, keyCols: Seq[String],
            watermark: String = "2 hours"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(keyCols)
    else {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.catalyst.expressions.RowOrdering
      require(!events.columns.contains("__rn"),
        "input column __rn collides with dedup's reserved temp name")
      // tie-breakers must be orderable — a MapType column in orderBy
      // throws AnalysisException. Non-orderable columns are skipped:
      // rows identical on every orderable column but differing in a
      // map keep a partition-order-dependent winner (documented limit).
      val rest = events.columns
        .filterNot(c => keyCols.contains(c) || c == "ts")
        .filter(c => RowOrdering.isOrderable(events.schema(c).dataType))
        .sorted
      val order = (if (events.columns.contains("ts")) Seq("ts") else Nil) ++ rest
      // all-columns-are-keys: duplicates are identical rows, any order works
      val orderCols = if (order.nonEmpty) order else keyCols
      val w = Window.partitionBy(keyCols.map(col): _*)
        .orderBy(orderCols.map(col(_).asc): _*)
      events.withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1).drop("__rn")
    }

  /** File-source stream wired through [[dedup]]. */
  def streamDedup(spark: SparkSession, dir: String, keyCols: Seq[String],
                  watermark: String = "2 hours"): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    val raw = spark.readStream.schema(schema).parquet(dir)
    dedup(nanosToTimestamp(raw), keyCols, watermark)
  }

  /** Stream-static enrichment: join a (possibly streaming) event frame
    * against a static dimension on `key`. The dimension is broadcast —
    * in streaming this is the supported stream-static join shape and
    * the stream side never shuffles; in batch it is the same plan as
    * every dimension join in Queries. Left join: events without a
    * dimension row survive with nulls (monitor, don't drop). */
  def enrich(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** File-source stream wired through [[enrich]]. */
  def streamEnrich(spark: SparkSession, dir: String, dim: DataFrame,
                   key: String): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    val raw = spark.readStream.schema(schema).parquet(dir)
    enrich(nanosToTimestamp(raw), dim, key)
  }

  /** Durable sink: drain the stream to parquet with a checkpoint.
    * Exactly-once comes from the checkpoint + file-sink manifest —
    * re-running the same query over the same source after a stop (or
    * crash) resumes from the committed offsets instead of reprocessing,
    * so restarts never duplicate rows. `availableNow` makes the same
    * pipeline a drainable batch job on a cluster. */
  def sinkToParquet(streamed: DataFrame, outDir: String,
                    checkpointDir: String): StreamingQuery =
    streamed.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()

  /**
   * Funnel analysis: how many users complete each prefix of `steps`
   * IN ORDER (sequential first-occurrence semantics — a user reaches
   * step k when their earliest step-k event falls STRICTLY after the
   * timestamp at which they reached step k-1). Returns one row per
   * step: (step, event_type, n_users), n_users monotone non-increasing.
   *
   * Plan shape: one type-filtered scan per step (the equality predicate
   * reaches the parquet scan; at scale, partition-by-type layouts prune
   * whole files) collapsing straight to a (user, min ts) partial+final
   * aggregate; each level joins the previous level's NARROW (user, ts)
   * frame on the user key — never event x event. Levels are
   * checkpointed eagerly (each feeds two consumers: the next level and
   * its own count) so level k is computed once, not k times. Step
   * count is bounded (funnels are 3-7 steps), so the join chain is
   * bounded too.
   */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    // __prev is the only reserved name that meets the raw event
    // columns (each level's output is rebuilt by groupBy/agg, so __ts
    // never joins against the input schema)
    require(!events.columns.contains("__prev"),
      "input column __prev collides with funnel's reserved name")
    val first = events.where(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("__ts"))
      .localCheckpoint(true)
    val levels = steps.tail.scanLeft(first) { (prev, st) =>
      events.where(col(typeCol) === st)
        .join(prev.select(col(userCol), col("__ts").as("__prev")),
          Seq(userCol))
        .where(col(tsCol) > col("__prev"))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("__ts"))
        .localCheckpoint(true)
    }
    levels.zip(steps).zipWithIndex.map { case ((lvl, st), i) =>
      lvl.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("step"), lit(st).as("event_type"),
          col("n_users"))
    }.reduce(_.unionByName(_))
  }

  /** Funnel state for [[funnelProgress]]: the number of steps the user
    * has completed and the timestamp of the last completed step
    * (epoch micros; Long.MinValue before the first step so the state
    * round-trips the encoder without nullable boxing). */
  case class FunnelState(step: Int, tsMicros: Long)
  case class FunnelProgress(user_id: Long, step_reached: Int)

  /**
   * Per-user funnel progress as a STATEFUL operator — the streaming
   * form of [[funnel]]: each user's state machine advances through
   * `steps` on strictly-increasing timestamps, via mapGroupsWithState
   * (bounded state: one (step, ts) pair per user). Runs on batch
   * frames too (state starts empty per group), where it is exactly
   * [[funnel]]'s greedy earliest-chain semantics — pinned by spec on
   * the driver fixture.
   *
   * Events are sorted by timestamp WITHIN each trigger batch; across
   * triggers the source must be time-ordered (the same contract as
   * [[userRunningCounts]] — a late event cannot rewind a state
   * machine). Output: one row per user with the step count reached
   * (0 = never entered the funnel); aggregate downstream for the
   * per-step conversion counts.
   */
  def funnelProgress(events: DataFrame, steps: Seq[String],
                     userCol: String = "user_id",
                     typeCol: String = "event_type",
                     tsCol: String = "ts"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val spark = events.sparkSession
    import spark.implicits._
    events
      // same calling convention as the level-join twin [[funnel]];
      // types are part of the contract (long user key, string type,
      // timestamp) — the typed state encoder needs them exact
      .select(col(userCol), col(typeCol), col(tsCol))
      .as[(Long, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .mapGroupsWithState[FunnelState, FunnelProgress](
        GroupStateTimeout.NoTimeout()) {
        case (user, rows, state: GroupState[FunnelState]) =>
          // full-microsecond key: getTime is millis-precise, and the
          // fixture carries sub-millisecond components — sorting on
          // millis would order same-millisecond events arbitrarily
          def micros(ts: java.sql.Timestamp): Long =
            ts.getTime * 1000 + ts.getNanos / 1000 % 1000
          var s = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
          rows.toSeq.sortBy(r => micros(r._3)).foreach { case (_, et, ts) =>
            val tsMicros = micros(ts)
            // the Long.MinValue sentinel makes the strict comparison
            // vacuously true for the first step — no special case
            if (s.step < steps.length && et == steps(s.step) &&
                tsMicros > s.tsMicros)
              s = FunnelState(s.step + 1, tsMicros)
          }
          state.update(s)
          FunnelProgress(user, s.step)
      }
      .toDF()
  }

  /** Per-user running state: event count + last seen timestamp via
    * mapGroupsWithState (custom stateful operator surface). */
  case class UserState(n: Long, lastTs: java.sql.Timestamp)
  case class UserUpdate(user_id: Long, n: Long, last_seen: java.sql.Timestamp)

  def userRunningCounts(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .selectExpr("user_id", "ts")
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .mapGroupsWithState[UserState, UserUpdate](GroupStateTimeout.NoTimeout()) {
        case (user, rows, state: GroupState[UserState]) =>
          var s = state.getOption.getOrElse(UserState(0L, new java.sql.Timestamp(0L)))
          rows.foreach { case (_, ts) =>
            s = UserState(s.n + 1,
              if (ts.after(s.lastTs)) ts else s.lastTs)
          }
          state.update(s)
          UserUpdate(user, s.n, s.lastTs)
      }
      .toDF()
  }
}
