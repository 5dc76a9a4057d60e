package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** PageRank against the hand-worked 3-node path graph. */
class GraphSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  test("two power iterations match the hand computation; mass conserved") {
    // path a - b - c (undirected): deg a=1, b=2, c=1; r0 = 1/3 each
    // iter1: a=c=0.05+0.85/6, b=0.05+0.85*2/3
    // iter2: a=c=0.05+0.85*(b1/2)=0.312083..., b=0.05+0.85*(a1+c1)=0.375833...
    val edges = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val r = Graph.pageRank(edges, iterations = 2)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(math.abs(r("a") - 0.3120833333) < 1e-9)
    assert(math.abs(r("c") - 0.3120833333) < 1e-9)
    assert(math.abs(r("b") - 0.3758333333) < 1e-9)
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
  }

  test("direction is ignored and duplicate edges collapse") {
    val e1 = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val e2 = Seq(("b", "a"), ("b", "c"), ("c", "b")).toDF("src", "dst")
    val r1 = Graph.pageRank(e1, iterations = 3)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    val r2 = Graph.pageRank(e2, iterations = 3)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r1 === r2)
  }

  test("a hub outranks leaves in a star graph") {
    val star = Seq(("hub", "x"), ("hub", "y"), ("hub", "z"))
      .toDF("src", "dst")
    val r = Graph.pageRank(star, iterations = 10)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r("hub") > r("x") && r("x") === r("y") && r("y") === r("z"))
  }
}
