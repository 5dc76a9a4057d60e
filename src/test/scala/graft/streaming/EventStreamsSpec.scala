package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** Streaming extension: the same windowed aggregations run in batch and
  * via readStream + watermark + availableNow, and must agree. */
class EventStreamsSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001/events.parquet"

  /** Stage a single-file parquet fixture into a fresh directory (file
    * stream sources need a directory, not a file). */
  private def stageDir(prefix: String, fixture: String = dir): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    val src = java.nio.file.Paths.get(fixture)
    java.nio.file.Files.copy(src, d.resolve(src.getFileName))
    d.toString
  }

  private lazy val events = {
    val raw = spark.read.parquet(dir)
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros((col("ts") / 1000).cast("long")))
      case _ => raw
    }
  }

  test("tumbling window batch aggregate sums events") {
    val out = EventStreams.tumbling(events).cache()
    val total = out.agg(sum("n")).head.getLong(0)
    assert(total === events.count())
    assert(out.columns.toSeq ===
      Seq("window_start", "event_type", "n", "sum_value"))
  }

  test("sliding windows double-count with half-width slide") {
    val n = events.count()
    val slid = EventStreams.sliding(events).agg(sum("n")).head.getLong(0)
    assert(slid === 2 * n) // every event falls into exactly 2 windows
  }

  test("session windows: counts preserved, sessions ordered") {
    val out = EventStreams.sessions(events)
    assert(out.agg(sum("n_events")).head.getLong(0) === events.count())
    assert(out.select("user_id").distinct().count() ===
      events.select("user_id").distinct().count())
  }

  test("streamed tumbling (watermark + availableNow) equals batch") {
    val streamDir = stageDir("graft-stream")
    val q = EventStreams.runOnce(spark,
      EventStreams.streamTumbling(spark, streamDir), "stream_tumbling")
    q.awaitTermination(120000)
    val streamed = spark.table("stream_tumbling")
      .orderBy("event_type", "window_start")
      .collect().map(_.toSeq).toSeq
    val batch = EventStreams.tumbling(events)
      .orderBy("event_type", "window_start")
      .collect().map(_.toSeq).toSeq
    assert(streamed === batch)
  }

  test("type-mix drift: hand-computed KL; streamed (complete) equals batch") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(min: Long) = new java.sql.Timestamp(base.getTime + min * 60000)
    // window 1: 3 a + 1 b; window 2: 2 b; ref = uniform (0.5, 0.5)
    val ev = Seq(
      ("a", at(0), 1.0), ("a", at(1), 1.0), ("a", at(2), 1.0),
      ("b", at(3), 1.0),
      ("b", at(61), 1.0), ("b", at(62), 1.0))
      .toDF("event_type", "ts", "value")
    val ref = Seq("a" -> 0.5, "b" -> 0.5)
    val got = EventStreams.typeMixDrift(ev, ref)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    def kl(na: Long, nb: Long): Double = {
      val tot = (na + nb + 2).toDouble
      val terms = Seq((na + 1) / tot, (nb + 1) / tot)
        .map(p => p * math.log(p / 0.5)).sum
      math.rint(terms * 1e3) / 1e3 + 0.0
    }
    assert(got === Map(
      "2024-01-01 00:00" -> ((4L, kl(3, 1))),
      "2024-01-01 01:00" -> ((2L, kl(0, 2)))))
    // the one-off mix (window 1) drifts more than... both drift; the
    // pure-b window is farther from uniform than 3:1
    assert(got("2024-01-01 01:00")._2 > got("2024-01-01 00:00")._2)
    // streamed complete-mode result is identical on the events fixture
    val streamDir = stageDir("graft-drift-stream")
    val fixtureRef = Seq("click" -> 0.4, "purchase" -> 0.1,
      "signup" -> 0.1, "view" -> 0.4)
    val q = EventStreams.runOnce(spark,
      EventStreams.streamTypeMixDrift(spark, streamDir, fixtureRef),
      "stream_drift")
    q.awaitTermination(120000)
    val streamed = spark.table("stream_drift")
      .orderBy("window_start").collect().map(_.toSeq).toSeq
    val batch = EventStreams.typeMixDrift(events, fixtureRef)
      .orderBy("window_start").collect().map(_.toSeq).toSeq
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("word-score scoring runs identically on a text stream") {
    // the reference's scoring flow (§3.1) applied through readStream:
    // same column transforms, streamed vs batch results must agree
    val docsPath = "/root/testdata/sf0.001/documents.parquet"
    val streamDir = stageDir("graft-score-stream", docsPath)
    val schema = spark.read.parquet(docsPath).schema
    val streamed = spark.readStream.schema(schema)
      .parquet(streamDir)
      .select(col("doc_id"),
        graft.wordscore.WordScore.scoreCol(col("text")).as("computed"))
    val q = streamed.writeStream.format("memory").queryName("scored_stream")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("scored_stream")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = spark.read.parquet(docsPath)
      .select(col("doc_id"),
        graft.wordscore.WordScore.scoreCol(col("text")).as("computed"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === want)
    assert(got.size === 500)
  }

  test("streamed session windows (append) equal the batch sessions the final watermark closed") {
    val streamDir = stageDir("graft-session-stream")
    val q = EventStreams.runOnce(spark,
      EventStreams.streamSessions(spark, streamDir, watermark = "0 seconds"),
      "stream_sessions",
      org.apache.spark.sql.streaming.OutputMode.Append())
    q.awaitTermination(120000)
    val streamed = spark.table("stream_sessions")
      .collect().map(_.toSeq).toSet
    // append emits exactly the sessions whose window closed behind the
    // final watermark (= max event ts, delay 0); the trailing open
    // session per user stays in state. The formatted output truncates
    // to seconds, so the closed-session count is recomputed from the
    // EXACT (micros) session_window ends instead of parsed strings.
    val norm = EventStreams.nanosToTimestamp(spark.read.parquet(dir))
    val maxTs = norm.agg(max("ts")).head.getTimestamp(0)
    val nClosed = norm
      .groupBy(session_window(col("ts"), "10 minutes").as("w"), col("user_id"))
      .count()
      .where(col("w.end") < lit(maxTs)).count()
    val batch = EventStreams.sessions(events)
      .collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty)
    assert(streamed.size.toLong === nClosed)
    // every emitted session is byte-identical to its batch counterpart
    assert(streamed.subsetOf(batch))
  }

  test("stream-stream interval self-join equals the batch theta join") {
    val streamDir = stageDir("graft-ssjoin")
    val q = EventStreams.streamIntervalJoin(spark, streamDir)
      .writeStream.format("memory").queryName("ssjoin_stream")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("ssjoin_stream")
      .collect().map(_.toSeq).toSet
    val norm = EventStreams.nanosToTimestamp(spark.read.parquet(dir))
    val v = norm.filter(col("event_type") === "view")
      .select(col("user_id"), unix_micros(col("ts")).as("v_us"))
    val p = norm.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), unix_micros(col("ts")).as("p_us"))
    val want = v.join(p,
      col("user_id") === col("pu") &&
        col("p_us") >= col("v_us") &&
        col("p_us") <= col("v_us") + 3600000000L)
      .select(col("user_id"), col("v_us"), col("p_us"))
      .collect().map(_.toSeq).toSet
    assert(want.nonEmpty)
    assert(got === want)
  }

  test("stream-stream LEFT OUTER interval join equals watermark-closable batch left join") {
    val streamDir = stageDir("graft-ssljoin")
    // zero-delay watermark: the final watermark lands on the max event
    // ts, making "which unmatched views could the stream have closed"
    // exactly computable for the pin
    val q = EventStreams.streamIntervalJoinLeftOuter(
      spark, streamDir, watermark = "0 seconds")
      .writeStream.format("memory").queryName("ssljoin_stream")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("ssljoin_stream")
      .collect().map(_.toSeq).toSet
    val norm = EventStreams.nanosToTimestamp(spark.read.parquet(dir))
    val v = norm.filter(col("event_type") === "view")
      .select(col("user_id"), unix_micros(col("ts")).as("v_us"))
    val p = norm.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), unix_micros(col("ts")).as("p_us"))
    // the GLOBAL watermark is the min over both watermarked branches'
    // max event times (each branch tracks its own; the query takes the
    // min) — on this fixture the view side trails the purchase side
    val maxUs = math.min(
      v.agg(max(col("v_us"))).head.getLong(0),
      p.agg(max(col("p_us"))).head.getLong(0))
    val winUs = 3600000000L
    val batchLeft = v.join(p,
      col("user_id") === col("pu") &&
        col("p_us") >= col("v_us") &&
        col("p_us") <= col("v_us") + winUs,
      "left")
      .select(col("user_id"), col("v_us"), col("p_us"))
    val wantMatched = batchLeft.where(col("p_us").isNotNull)
      .collect().map(_.toSeq).toSet
    // an unmatched view emits null-extended only once the watermark
    // passes the END of its join window (v_us + window): until then a
    // future purchase could still match, so Spark's left-side state
    // watermark is `watermark - window`, NOT the watermark itself.
    // The pin brackets that rule with a 1 s band on each side for the
    // state-watermark solver's coarse-grain arithmetic.
    val wmUs = maxUs / 1000L * 1000L
    val batchUnmatched = batchLeft.where(col("p_us").isNull)
      .collect().map(_.toSeq).toSet
    val mustEmit = batchLeft.where(col("p_us").isNull &&
      col("v_us") + winUs < wmUs - 1000000L)
      .collect().map(_.toSeq).toSet
    val mustNotEmit = batchLeft.where(col("p_us").isNull &&
      col("v_us") + winUs >= wmUs + 1000000L)
      .collect().map(_.toSeq).toSet
    assert(wantMatched.nonEmpty && mustEmit.nonEmpty)
    // matched rows are the inner result, complete
    assert(got.filter(_(2) != null) === wantMatched)
    val gotUnmatched = got.filter(_(2) == null)
    // every null-extended row is a genuine batch non-match
    assert(gotUnmatched.subsetOf(batchUnmatched))
    // everything safely behind the watermark was flushed
    assert(mustEmit.subsetOf(gotUnmatched),
      mustEmit.diff(gotUnmatched).mkString(";"))
    // nothing the watermark could not yet close leaked out
    assert(gotUnmatched.intersect(mustNotEmit).isEmpty,
      gotUnmatched.intersect(mustNotEmit).mkString(";"))
  }

  test("session gap boundary: an exact-gap successor MERGES (both engines)") {
    // the q29/q128 boundary contract, pinned empirically: Spark's
    // session_window MERGES an event arriving exactly `gap` after its
    // predecessor (touching [ts, ts+gap) intervals coalesce — the
    // merge rule is start <= previous end, not strict overlap), and
    // one second past the gap splits. The DuckDB oracles encode the
    // identical rule as `delta > gap => new session` (equality
    // merges). This fixture makes the convention load-bearing instead
    // of fixture-accidental — if either engine's boundary rule ever
    // drifts, this test or the q29/q128 oracle rows go red.
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(sec: Long) = new java.sql.Timestamp(base.getTime + sec * 1000)
    val ev = Seq(
      (1L, "u1", at(0), 1.0),
      (2L, "u1", at(600), 1.0), // exactly 10 min after event 1: merges
      (3L, "u1", at(700), 1.0),
      (4L, "u2", at(0), 1.0),
      (5L, "u2", at(601), 1.0)  // 1 s PAST the gap: new session
    ).toDF("event_id", "user_id", "ts", "value")
    val sess = EventStreams.sessions(ev).orderBy("user_id", "session_start")
      .collect().map(r => (r.getString(0), r.getLong(3)))
    assert(sess.toSeq === Seq(("u1", 3L), ("u2", 1L), ("u2", 1L)),
      sess.mkString(";"))
    // and the SQL-side rule on the same fixture: delta > gap splits
    // u2 only — replicated with a Spark window so the pin is
    // self-contained (the DuckDB replay runs in the driver gate)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val marked = ev.withColumn("__new",
      when(col("ts").cast("long") - lag(col("ts").cast("long"), 1).over(w)
        > 600L, 1).otherwise(0))
    val nSessionsSql = marked.groupBy("user_id")
      .agg((sum("__new") + 1).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(nSessionsSql === Map("u1" -> 1L, "u2" -> 2L))
  }

  test("session concurrency curve: covers every session slot, bounded by session count") {
    val norm = EventStreams.nanosToTimestamp(spark.read.parquet(dir))
    val curve = EventStreams.sessionConcurrency(norm, "user_id").cache()
    val nSessions = EventStreams.sessions(norm).count()
    // every session covers >= 1 slot and activity sums count coverage
    assert(curve.agg(sum("n_active")).head.getLong(0) >= nSessions)
    // no slot can host more concurrent sessions than there are sessions
    assert(curve.agg(max("n_active")).head.getLong(0) <= nSessions)
    // slots are unique and ordered
    assert(curve.select("slot").distinct().count() === curve.count())
  }

  test("inter-event gaps and transition matrix are consistent with event counts") {
    val norm = EventStreams.nanosToTimestamp(spark.read.parquet(dir))
    val gaps = EventStreams.interEventGaps(norm, "user_id", "event_id")
    assert(gaps.count() === norm.count())
    // gaps are non-negative and exactly the per-user firsts are null
    assert(gaps.where(col("gap_us") < 0).count() === 0)
    val firsts = norm.select("user_id").distinct().count()
    assert(gaps.where(col("gap_us").isNull).count() === firsts)
    val tm = EventStreams.transitionMatrix(norm, "user_id", "event_type",
      "event_id")
    // every observed transition is counted exactly once
    assert(tm.agg(sum("n")).head.getLong(0) === norm.count() - firsts)
    // conditional probabilities sum to ~1 per prev (4-decimal rounding)
    tm.groupBy("prev_type").agg(sum("prob").as("s")).collect().foreach { r =>
      assert(math.abs(r.getDouble(1) - 1.0) < 0.02, r.toString)
    }
  }

  test("streaming dedup (watermarked) equals batch distinct key count") {
    val streamDir = stageDir("graft-dedup-stream")
    val keys = Seq("user_id", "event_type")
    val q = EventStreams.streamDedup(spark, streamDir, keys)
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("dedup_stream")
    // one survivor per key (the fixture drains in one micro-batch, so
    // the watermark horizon never evicts mid-run)
    assert(streamed.count() ===
      events.select(keys.map(col): _*).distinct().count())
    assert(streamed.select(keys.map(col): _*).distinct().count() ===
      streamed.count())
    // batch form of the same call keeps one survivor per key too
    assert(EventStreams.dedup(events, keys).count() === streamed.count())
  }

  test("batch dedup picks a deterministic earliest-ts winner") {
    import spark.implicits._
    val t = (s: String) => java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      (1L, "click", t("2024-01-01 00:00:02"), "late"),
      (1L, "click", t("2024-01-01 00:00:01"), "first"),
      (1L, "view", t("2024-01-01 00:00:05"), "only"),
      (2L, "click", t("2024-01-01 00:00:03"), "b"),
      (2L, "click", t("2024-01-01 00:00:03"), "a")) // ts tie -> payload breaks it
      .toDF("user_id", "event_type", "ts", "payload")
    // the winner must not depend on physical partition layout
    Seq(rows.repartition(1), rows.repartition(7, col("payload"))).foreach { df =>
      val got = EventStreams.dedup(df, Seq("user_id", "event_type"))
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getString(3))
        .toMap
      assert(got === Map(
        (1L, "click") -> "first",
        (1L, "view") -> "only",
        (2L, "click") -> "a"))
    }
  }

  test("batch dedup tolerates non-orderable (map) payload columns") {
    import spark.implicits._
    val t = (s: String) => java.sql.Timestamp.valueOf(s)
    // a MapType column cannot appear in orderBy; dedup must skip it as
    // a tie-breaker instead of throwing AnalysisException
    val rows = Seq(
      (1L, t("2024-01-01 00:00:02"), Map("k" -> "late")),
      (1L, t("2024-01-01 00:00:01"), Map("k" -> "first")),
      (2L, t("2024-01-01 00:00:03"), Map("k" -> "only")))
      .toDF("user_id", "ts", "attrs")
    val got = EventStreams.dedup(rows, Seq("user_id"))
      .collect().map(r => r.getLong(0) -> r.getMap[String, String](2)("k"))
      .toMap
    assert(got === Map(1L -> "first", 2L -> "only"))
  }

  test("stream-static enrichment equals the batch broadcast join") {
    val streamDir = stageDir("graft-enrich-stream")
    val dim = events.select("user_id").distinct()
      .withColumn("segment",
        concat(lit("seg"), pmod(col("user_id"), lit(3)).cast("string")))
    val q = EventStreams.streamEnrich(spark, streamDir, dim, "user_id")
      .writeStream.format("memory").queryName("enrich_stream")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("enrich_stream").groupBy("segment").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = EventStreams.enrich(events, dim, "user_id")
      .groupBy("segment").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === want)
    assert(got.values.sum === events.count())
    assert(!got.keySet.contains(null)) // every event found its dim row
  }

  test("parquet sink is exactly-once across a restart (checkpointed)") {
    val streamDir = stageDir("graft-sink-src")
    val outDir = java.nio.file.Files.createTempDirectory("graft-sink-out")
    val ckDir = java.nio.file.Files.createTempDirectory("graft-sink-ck")
    val schema = spark.read.parquet(dir).schema
    def run(): Unit = {
      val raw = spark.readStream.schema(schema).parquet(streamDir)
      val q = EventStreams.sinkToParquet(
        EventStreams.nanosToTimestamp(raw).select("event_id", "user_id"),
        outDir.toString, ckDir.toString)
      q.awaitTermination(120000)
    }
    run()
    val n = events.count()
    assert(spark.read.parquet(outDir.toString).count() === n)
    // restart over the same source + checkpoint: offsets are committed,
    // nothing reprocesses, row count unchanged
    run()
    assert(spark.read.parquet(outDir.toString).count() === n)
  }

  test("funnel: sequential first-occurrence with strict ordering") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    val ev = Seq(
      (1L, "view", ts(1)), (1L, "click", ts(2)), (1L, "purchase", ts(3)),
      (2L, "view", ts(1)), (2L, "click", ts(3)),           // no purchase
      (3L, "click", ts(1)), (3L, "view", ts(2)),           // click BEFORE view only
      (4L, "purchase", ts(1)),                             // never enters
      (5L, "view", ts(1)), (5L, "click", ts(1))            // tie -> strict > rejects
    ).toDF("user_id", "event_type", "ts")
    val out = EventStreams.funnel(ev, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    assert(out.toSeq === Seq(
      (1, "view", 4L),      // users 1, 2, 3, 5
      (2, "click", 2L),     // users 1, 2 (3's click precedes; 5 ties)
      (3, "purchase", 1L))) // user 1
  }

  test("funnelProgress (stateful) matches the level-join funnel on the fixture") {
    val steps = Seq("view", "click", "purchase")
    val prog = EventStreams.funnelProgress(events, steps)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val levels = EventStreams.funnel(events, "user_id", "event_type", "ts", steps)
      .collect().map(r => (r.getInt(0), r.getLong(2))).toMap
    // two independent formulations of the same semantics (greedy
    // earliest chain): users at step >= k must equal level k's count
    (1 to steps.length).foreach { k =>
      assert(prog.count(_._2 >= k).toLong === levels(k), s"step $k")
    }
    // every user appears exactly once, including never-entered ones
    assert(prog.map(_._1).distinct.length === prog.length)
    assert(prog.length === events.select("user_id").distinct.count().toInt)
  }

  test("loader normalizes the CURRENT fixture's ts to an instant type") {
    // Regression pin for the round-8 break: the fixture regeneration
    // flipped ts from LongType-nanos to TIMESTAMP_NTZ and both the
    // code and the tests read it through the same (unprepared) loader,
    // so nothing failed until the driver ran. This asserts the
    // contract directly against whatever events.parquet ships today:
    // after nanosToTimestamp, ts must be the instant TimestampType
    // (what unix_micros and withWatermark require), for every scale
    // factor present on disk.
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val p = s"/root/testdata/$sf/events.parquet"
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(p))) {
        val normalized = EventStreams.nanosToTimestamp(spark.read.parquet(p))
        assert(normalized.schema("ts").dataType ===
          org.apache.spark.sql.types.TimestampType, s"$sf ts type")
        // and the watermark path actually accepts it (analysis only)
        normalized.withWatermark("ts", "2 hours").queryExecution.analyzed
      }
    }
  }

  test("mapGroupsWithState running counts match groupBy in batch") {
    val got = EventStreams.userRunningCounts(events)
      .select("user_id", "n")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = events.groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
  }
}
