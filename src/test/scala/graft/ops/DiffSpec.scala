package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Corpus diff semantics: the four statuses, digest sensitivity,
  * narrow (key, digest) join shape. */
class DiffSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private val old = Seq(
    (1L, "alpha", "s0"), (2L, "beta", "s0"),
    (3L, "gamma", "s1"), (4L, "delta", "s1"))
    .toDF("id", "text", "source")

  private val newer = Seq(
    (1L, "alpha", "s0"),     // same
    (2L, "beta EDITED", "s0"), // changed (text)
    (4L, "delta", "s9"),     // changed (non-text column counts too)
    (5L, "epsilon", "s1"))   // added; 3 removed
    .toDF("id", "text", "source")

  test("classifies added/removed/changed/same") {
    val got = Diff.rowDiff(old, newer, "id", Seq("text", "source"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "same", 2L -> "changed", 3L -> "removed",
      4L -> "changed", 5L -> "added"))
  }

  test("summary counts and key digests") {
    val got = Diff.diffSummary(old, newer, "id", Seq("text", "source"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq === Seq(
      ("added", 1L, "5"), ("changed", 2L, "6"),
      ("removed", 1L, "3"), ("same", 1L, "1")))
  }

  test("the join consumes digests, not full rows") {
    val diff = Diff.rowDiff(old, newer, "id", Seq("text", "source"))
    assert(diff.columns.toSeq === Seq("id", "status"))
    // in the optimized plan the md5 projection sits BELOW the join:
    // the join node's own output carries only ids and digest columns
    val join = diff.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(join.size === 1)
    val joinCols = join.head.output.map(_.name).toSet
    assert(joinCols === Set("id", "__old", "__new"), joinCols)
  }
}
