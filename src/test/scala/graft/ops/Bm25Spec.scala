package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** BM25 scoring against hand-computed values (Lucene idf variant). */
class Bm25Spec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private val docs = Seq(
    (1L, "a b a"),
    (2L, "b c"),
    (3L, "d d d a"))
    .toDF("doc_id", "text")

  test("scores match the hand-computed formula, ranked desc") {
    // N=3, avgdl=3.0, df(a)=df(b)=2 -> idf=ln(1.6)=0.4700036...
    // doc1: a tf=2 dl=3 -> 0.47*2*2.2/3.2 ; b tf=1 -> 0.47*2.2/2.2
    // doc2: b tf=1 dl=2 -> 0.47*2.2/1.9
    // doc3: a tf=1 dl=4 -> 0.47*2.2/2.5
    val rows = Bm25.topDocs(docs, "doc_id", "text", Seq("a", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.toSeq === Seq(
      (1L, 2L, 1.1163), (2L, 1L, 0.5442), (3L, 1L, 0.4136)))
  }

  test("unmatched documents are not candidates; topK bounds output") {
    val rows = Bm25.topDocs(docs, "doc_id", "text", Seq("d"), topK = 5)
      .collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(3L))
    val capped = Bm25.topDocs(docs, "doc_id", "text", Seq("a", "b"), topK = 1)
    assert(capped.count() === 1)
  }

  test("case-insensitive tokens; rounded-score ties break by id") {
    val dup = Seq((1L, "X y"), (2L, "x Y")).toDF("doc_id", "text")
    val rows = Bm25.topDocs(dup, "doc_id", "text", Seq("x"))
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(rows.length === 2)
    assert(rows(0)._2 === rows(1)._2) // identical docs, identical score
    assert(rows.map(_._1).toSeq === Seq(1L, 2L))
  }

  test("plan: corpus-sized work is map + one (doc,term) aggregate; stats broadcast") {
    val q = Bm25.topDocs(docs, "doc_id", "text", Seq("a"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }
}
