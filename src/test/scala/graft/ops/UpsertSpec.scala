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

  test("exact duplicate deliveries are a no-op (deterministic ties)") {
    val changes = Seq(
      (1L, "dup", 5, false),
      (1L, "dup", 5, false)) // same row delivered twice
      .toDF("id", "text", "version", "del")
    val out = Upsert.merge(snapshot, changes, "id", "version", "del")
      .where($"id" === 1L).collect()
    assert(out.length === 1 && out.head.getString(1) === "dup")
  }
}
