package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Budget.selectByTokenBudget — the decomposed cumsum must equal the
  * textbook single-window global running sum, boundary inclusive. */
class BudgetSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private def naive(df: org.apache.spark.sql.DataFrame, budget: Long) = {
    val w = Window.orderBy(col("q").desc, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_tokens", sum(col("tok")).over(w))
      .where(col("cum_tokens") <= budget)
      .select("id", "cum_tokens")
  }

  private val docs = Seq(
    // (id, quality, tokens) — ties on quality force the id tiebreak,
    // and the 0.5 group straddles the budget boundary
    (1L, 0.9, 10L), (2L, 0.9, 10L), (3L, 0.7, 5L),
    (4L, 0.5, 20L), (5L, 0.5, 20L), (6L, 0.5, 20L),
    (7L, 0.2, 1L)).toDF("id", "q", "tok")

  test("matches the single-window global cumsum at every budget") {
    for (budget <- Seq(5L, 10L, 25L, 45L, 65L, 85L, 86L, 1000L)) {
      val got = Budget.selectByTokenBudget(docs, "id", "q", "tok", budget)
        .select("id", "cum_tokens")
      val want = naive(docs, budget)
      assert(got.orderBy("id").collect().toSeq ===
        want.orderBy("id").collect().toSeq, s"budget=$budget")
    }
  }

  test("boundary is inclusive and cut is mid-tie-group") {
    // budget 65 = 10+10+5+20+20: keeps ids 1,2,3,4,5 — id 6 (same
    // quality 0.5 as 4/5, higher id) is the one cut
    val kept = Budget.selectByTokenBudget(docs, "id", "q", "tok", 65L)
      .select("id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("null quality rows are ineligible") {
    val withNull = docs.union(
      Seq((8L, null.asInstanceOf[java.lang.Double], 1L)
        ).toDF("id", "q", "tok"))
    val kept = Budget.selectByTokenBudget(withNull, "id", "q", "tok", 10000L)
      .select("id").as[Long].collect().sorted
    assert(!kept.contains(8L) && kept.length === 7)
  }

  test("capPerGroupSummary accounts kept/dropped and quality floor") {
    val df = Seq(
      ("a", 1L, 0.9, 10L), ("a", 2L, 0.8, 20L), ("a", 3L, 0.1, 5L),
      ("b", 4L, 0.4, 7L)).toDF("src", "id", "q", "tok")
    val got = Sample.capPerGroupSummary(df, "src", "q", "id", "tok", k = 2)
      .orderBy("src")
      .as[(String, Long, Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      ("a", 3L, 2L, 1L, 30L, 0.8), // keeps 0.9+0.8, drops 0.1
      ("b", 1L, 1L, 0L, 7L, 0.4)))
  }
}
