package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Changelog-merge semantics: latest version wins, tombstones delete,
  * change beats snapshot at equal version, inserts appear. */
class UpsertSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private val snapshot = Seq(
    (1L, "one-v0", 0),
    (2L, "two-v0", 0),
    (3L, "three-v0", 0),
    (4L, "four-v0", 0))
    .toDF("id", "text", "version")

  test("latest version wins; tombstones delete; inserts appear") {
    val changes = Seq(
      (2L, "two-v2", 2, false),   // update
      (2L, "two-v1", 1, false),   // superseded update
      (3L, null: String, 1, true), // tombstone
      (9L, "nine-v0", 0, false))  // insert
      .toDF("id", "text", "version", "del")
    val out = Upsert.merge(snapshot, changes, "id", "version", "del")
      .orderBy("id").collect().map(r => r.getLong(0) -> r.getString(1))
    assert(out.toSeq === Seq(
      1L -> "one-v0", 2L -> "two-v2", 4L -> "four-v0", 9L -> "nine-v0"))
  }

  test("change beats snapshot at the same version (re-delivery)") {
    val changes = Seq((1L, "one-v0-redelivered", 0, false))
      .toDF("id", "text", "version", "del")
    val out = Upsert.merge(snapshot, changes, "id", "version", "del")
      .where($"id" === 1L).collect()
    assert(out.map(_.getString(1)).toSeq === Seq("one-v0-redelivered"))
  }

  test("snapshot without the tombstone column never deletes") {
    val changes = Seq((4L, "four-v3", 3, true))
      .toDF("id", "text", "version", "del")
    // snapshot has no `del` column at all
    val out = Upsert.merge(snapshot, changes, "id", "version", "del")
      .orderBy("id").collect().map(_.getLong(0))
    assert(out.toSeq === Seq(1L, 2L, 3L)) // 4 tombstoned away
  }

  test("merge is one key shuffle") {
    // parquet-backed input: local literal relations plan single-
    // partition and show no exchange at all
    val snap = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
      .withColumn("version", org.apache.spark.sql.functions.lit(0))
    val changes = Seq((1L, "x", 1, false))
      .toDF("doc_id", "text", "version", "del")
    val merged = Upsert.merge(snap, changes, "doc_id", "version", "del")
    val plan = merged.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r
      .findAllMatchIn(plan).size === 1, plan.take(2000))
  }

  test("keepTombstones retains the marker and suppresses late old versions") {
    val tomb = Seq((3L, null: String, 2, true))
      .toDF("id", "text", "version", "del")
    val kept = Upsert.merge(snapshot, tomb, "id", "version", "del",
      keepTombstones = true)
    val r3 = kept.where($"id" === 3L).collect()
    assert(r3.length === 1 && r3.head.getAs[Boolean]("del"))
    // a later merge delivering an OLDER version of key 3 stays deleted
    val late = Seq((3L, "three-v1", 1, false))
      .toDF("id", "text", "version", "del")
    val after = Upsert.merge(kept, late, "id", "version", "del",
      keepTombstones = true)
    val r3b = after.where($"id" === 3L).collect()
    assert(r3b.length === 1 && r3b.head.getAs[Boolean]("del"))
    // ...where the dropped-tombstone form would have resurrected it
    val dropped = Upsert.merge(snapshot, tomb, "id", "version", "del")
    val resurrect = Upsert.merge(dropped, late, "id", "version", "del")
    assert(resurrect.where($"id" === 3L).count() === 1)
  }

  test("streamMerge: incremental CDC equals one-shot merge; tombstones persist") {
    import org.apache.spark.sql.functions.{col, not}
    val dir = java.nio.file.Files.createTempDirectory("upsert_stream_")
    val changesDir = dir.resolve("changes").toString
    val targetDir = dir.resolve("target").toString
    val cpDir = dir.resolve("cp").toString
    def drop(rows: Seq[(Long, String, Int, Boolean)]): Unit =
      rows.toDF("id", "text", "version", "del")
        .coalesce(1).write.mode("append").parquet(changesDir)
    drop(Seq((1L, "one-v0", 0, false), (2L, "two-v0", 0, false),
      (3L, "three-v0", 0, false)))
    drop(Seq((2L, "two-v2", 2, false), (3L, null: String, 3, true),
      (4L, "four-v1", 1, false)))
    drop(Seq((3L, "three-v1", 1, false))) // late, older than the tombstone
    val schema = spark.read.parquet(changesDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(changesDir)
    Upsert.streamMerge(stream, targetDir, cpDir, "id", "version", "del")
      .awaitTermination()
    val clean = spark.read.parquet(targetDir).where(not(col("del")))
      .select("id", "text", "version").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(clean.toSeq === Seq(
      (1L, "one-v0", 0), (2L, "two-v2", 2), (4L, "four-v1", 1)))
    // one-shot merge of the whole changelog agrees
    val all = spark.read.parquet(changesDir)
    val oneShot = Upsert.merge(all.limit(0).drop("del"), all,
      "id", "version", "del")
      .select("id", "text", "version").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(oneShot.toSeq === clean.toSeq)
    // restart with the same checkpoint and no new files: a no-op
    val before = spark.read.parquet(targetDir).collect().toSet
    Upsert.streamMerge(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(changesDir),
      targetDir, cpDir, "id", "version", "del").awaitTermination()
    assert(spark.read.parquet(targetDir).collect().toSet === before)
  }

  test("exact duplicate deliveries are a no-op (deterministic ties)") {
    val changes = Seq(
      (1L, "dup", 5, false),
      (1L, "dup", 5, false)) // same row delivered twice
      .toDF("id", "text", "version", "del")
    val out = Upsert.merge(snapshot, changes, "id", "version", "del")
      .where($"id" === 1L).collect()
    assert(out.length === 1 && out.head.getString(1) === "dup")
  }

  test("scd2: runs collapse (including null runs), half-open intervals, current flag") {
    val log = Seq(
      (1L, Some("a"), 10L, 1L), (1L, Some("a"), 20L, 2L), // run of a
      (1L, Some("b"), 30L, 3L),
      (1L, None, 40L, 4L), (1L, None, 50L, 5L), // run of nulls
      (1L, Some("a"), 60L, 6L), // back to a — a NEW run, not merged
      (2L, Some("x"), 5L, 7L))
      .toDF("k", "v", "o", "id")
    val got = Upsert.scd2(log, "k", "v", "o", "id")
      .select($"k", $"v", $"valid_from", $"valid_to", $"is_current")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getBoolean(4))).toSet
    assert(got === Set(
      (1L, Some("a"), 10L, Some(30L), false),
      (1L, Some("b"), 30L, Some(40L), false),
      (1L, None, 40L, Some(60L), false),
      (1L, Some("a"), 60L, None, true),
      (2L, Some("x"), 5L, None, true)))
  }
}
