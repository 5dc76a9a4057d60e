package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.{col, lit}

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

  test("bucketed pageRank matches the plain loop; edge side never re-shuffles") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"),
      ("a", "c")).toDF("src", "dst")
    val tmp = java.nio.file.Files.createTempDirectory("graft_pr_bucketed_")
    try {
      val plain = Graph.pageRank(edges, iterations = 5)
        .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
      // overwrite = true: a crashed prior run may have left the table
      val bucketed = Graph.pageRankBucketed(edges, "graft_pr_edges",
        tmp.resolve("e").toString, iterations = 5, overwrite = true)
        .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
      // name collision without overwrite fails loudly instead of
      // clobbering the existing table
      val e = intercept[IllegalArgumentException] {
        Graph.pageRankBucketed(edges, "graft_pr_edges",
          tmp.resolve("e2").toString, iterations = 1)
      }
      assert(e.getMessage.contains("already exists"))
      assert(plain.keySet === bucketed.keySet)
      for (k <- plain.keySet)
        assert(math.abs(plain(k) - bucketed(k)) < 1e-12, k)
      assert(math.abs(bucketed.values.sum - 1.0) < 1e-9)
      // the per-iteration join re-shuffles ONLY the rank side: the
      // bucketed edge scan feeds the sort-merge join with its storage
      // partitioning, so the join plan holds exactly ONE hash exchange
      // (pre-AQE executedPlan, after EnsureRequirements — the q92
      // assertion pattern)
      val withDeg = spark.table("graft_pr_edges")
      val ranks = withDeg.select(col("src").as("node")).distinct()
        .withColumn("rank", lit(0.25))
      val join = withDeg.join(ranks.hint("merge"),
        withDeg("src") === ranks("node"))
      join.collect()
      // count exchanges in the FINAL adaptive plan only (the plan
      // string repeats the initial plan below it)
      val plan = join.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(plan.contains("SortMergeJoin"), plan.take(2000))
      // at most the rank side hashes (here even that side arrives
      // pre-partitioned on node, so the join is fully Exchange-free);
      // the EDGE side must never re-shuffle
      assert(exchanges <= 1, plan.take(3000))
      assert(!plan.contains("Exchange hashpartitioning(src"), plan.take(3000))
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_pr_edges")
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("a hub outranks leaves in a star graph") {
    val star = Seq(("hub", "x"), ("hub", "y"), ("hub", "z"))
      .toDF("src", "dst")
    val r = Graph.pageRank(star, iterations = 10)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r("hub") > r("x") && r("x") === r("y") && r("y") === r("z"))
  }
}
