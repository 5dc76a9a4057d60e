package graft.ops

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Gap-fill semantics: dense per-key grids, forward-filled values,
  * gap flags, and the one-data-shuffle plan shape. */
class TimeSeriesSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private def ts(hour: Int, minute: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $hour%02d:$minute%02d:00")

  // key "a" observes hours 0, 1, 4 (gap at 2-3); key "b" hours 2, 3.
  private val events = Seq(
    ("a", ts(0), 1.0), ("a", ts(0, 30), 2.0),
    ("a", ts(1), 10.0),
    ("a", ts(4), 7.0),
    ("b", ts(2), 5.0), ("b", ts(3), 6.0))
    .toDF("k", "ts", "value")

  private def filled =
    TimeSeries.gapFill(events, "k", "ts", "value", stepSeconds = 3600L)
      .orderBy("k", "slot")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))

  private val base = 473352L // floor(epoch('2024-01-01 00:00 UTC')/3600)

  test("synthesizes every slot between each key's first and last") {
    assert(filled.map(t => (t._1, t._2)).toSeq === Seq(
      ("a", base), ("a", base + 1), ("a", base + 2), ("a", base + 3),
      ("a", base + 4),
      ("b", base + 2), ("b", base + 3)))
  }

  test("forward-fills gap slots from the last observed aggregate") {
    val byIdx = filled.map(t => (t._1, t._2 - base) -> (t._3, t._4, t._5))
      .toMap
    assert(byIdx(("a", 0L)) === ((2L, 3.0, false))) // 1.0 + 2.0, 2 events
    assert(byIdx(("a", 1L)) === ((1L, 10.0, false)))
    assert(byIdx(("a", 2L)) === ((0L, 10.0, true))) // carried forward
    assert(byIdx(("a", 3L)) === ((0L, 10.0, true)))
    assert(byIdx(("a", 4L)) === ((1L, 7.0, false)))
    assert(byIdx(("b", 2L)) === ((1L, 5.0, false)))
    assert(byIdx(("b", 3L)) === ((1L, 6.0, false)))
  }

  test("keys never cross-contaminate: b starts at its own first slot") {
    assert(!filled.exists(t => t._1 == "b" && t._2 < base + 2))
  }

  test("the only corpus-sized shuffle is the slot aggregate") {
    val plan = TimeSeries.gapFill(events, "k", "ts", "value")
      .queryExecution.executedPlan.toString
    // events appear exactly once as a scan source: the grid is built
    // from the aggregated frame, not by re-scanning the input
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
