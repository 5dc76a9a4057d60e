package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Graph analytics over edge-list DataFrames — extension surface (no
 * reference counterpart). Complements [[Dedup.componentsOf]]'s
 * connected components with an importance measure: PageRank over an
 * undirected graph (every edge contributes both directions, so there
 * are no dangling nodes and rank mass is conserved).
 *
 * Scale shape: the degree-annotated edge frame is built ONCE and
 * persisted; each power iteration is one equi-join of edges with the
 * current (node, rank) frame plus one partial+final hash aggregate on
 * the destination — the standard data-parallel PageRank step. Ranks
 * are localCheckpoint'd per iteration to keep lineage flat; at
 * cluster scale the same loop runs with the edge frame bucketed by
 * `src` so the per-iteration join never re-shuffles the (large) edge
 * side, or hands off to Pregel-style messaging (GraphX/GraphFrames)
 * when iteration counts grow.
 */
object Graph {

  /** PageRank with uniform teleport. `edges` needs (src, dst) columns;
    * direction is ignored (both directions are added). Returns
    * (node, rank) with ranks summing to 1 over the graph's nodes. */
  def pageRank(edges: DataFrame, iterations: Int = 10,
               damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val und = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val deg = und.groupBy("src").agg(count(lit(1)).as("__deg"))
    val withDeg = und.join(deg, "src").localCheckpoint(true)
    val nodes = deg.select(col("src").as("node")).localCheckpoint(true)
    val n = nodes.count()
    val teleport = (1.0 - damping) / n
    var ranks = nodes.select(col("node"), (lit(1.0) / n).as("rank"))
      .localCheckpoint(true)
    var i = 0
    while (i < iterations) {
      val contribs = withDeg
        .join(ranks, withDeg("src") === ranks("node"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") / col("__deg")).as("__in"))
      // every node has degree >= 1 in the undirected graph, so the
      // join is total and no coalesce-for-dangling is needed
      val next = contribs
        .select(col("node"),
          (lit(teleport) + lit(damping) * col("__in")).as("rank"))
        .localCheckpoint(true)
      ranks.unpersist()
      ranks = next
      i += 1
    }
    ranks
  }
}
