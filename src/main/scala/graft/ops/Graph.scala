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
 * are localCheckpoint'd per iteration to keep lineage flat. At
 * cluster scale use [[pageRankBucketed]]: the edge frame is written
 * bucketed by `src`, so the per-iteration join re-shuffles ONLY the
 * (node-sized) rank frame, never the (much larger) edge side —
 * asserted Exchange-free on the edge side in GraphSpec. Iteration
 * counts beyond a few dozen warrant handing off to Pregel-style
 * messaging (GraphX/GraphFrames).
 */
object Graph {

  /** Undirected, deduped edge frame annotated with the source node's
    * degree — the loop-invariant every PageRank variant iterates
    * over. */
  private[ops] def degreeEdges(edges: DataFrame): DataFrame = {
    val und = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val deg = und.groupBy("src").agg(count(lit(1)).as("__deg"))
    und.join(deg, "src")
  }

  /** One power-iteration contribution step: rank mass flows along
    * every (degree-annotated) edge and re-aggregates on the
    * destination. `mergeHint` forces a sort-merge join so the
    * bucketed variant's edge side keeps its storage partitioning
    * (AQE would otherwise broadcast small rank fixtures, which hides
    * the production plan shape). */
  private[ops] def contribStep(withDeg: DataFrame, ranks: DataFrame,
                               mergeHint: Boolean): DataFrame = {
    val r = if (mergeHint) ranks.hint("merge") else ranks
    withDeg.join(r, withDeg("src") === r("node"))
      .groupBy(col("dst").as("node"))
      .agg(sum(col("rank") / col("__deg")).as("__in"))
  }

  /** PageRank with uniform teleport. `edges` needs (src, dst) columns;
    * direction is ignored (both directions are added). Returns
    * (node, rank) with ranks summing to 1 over the graph's nodes. */
  def pageRank(edges: DataFrame, iterations: Int = 10,
               damping: Double = 0.85): DataFrame = {
    val withDeg = degreeEdges(edges).localCheckpoint(true)
    iterate(withDeg, iterations, damping, mergeHint = false)
  }

  /**
   * PageRank over a PRE-BUCKETED edge layout — the 100 TB form of
   * [[pageRank]]'s loop. The degree-annotated undirected edge frame
   * is written ONCE as a `bucketBy(src)` table (pay the shuffle at
   * write time), and every one of the `iterations` joins then reads
   * the bucketed scan's partitioning directly: the only per-iteration
   * exchanges are the (node, rank) frame hashing to the bucket scheme
   * and the contribution aggregate — the edge side, which dominates
   * bytes at scale, never re-shuffles (GraphSpec asserts the join
   * plan adds no Exchange over the bucketed scan). Results are the
   * same ranks as [[pageRank]] up to float summation order.
   *
   * The bucketed table is a PERSISTED ARTIFACT (like the IVF/Band
   * index saves): it stays registered after the call so later runs
   * can reuse the layout. A name collision with an existing catalog
   * table fails loudly unless `overwrite = true` — `table` is a
   * destructive sink name, not a scratch name.
   */
  def pageRankBucketed(edges: DataFrame, table: String, path: String,
                       iterations: Int = 10, damping: Double = 0.85,
                       buckets: Int = 8, overwrite: Boolean = false): DataFrame = {
    val spark = edges.sparkSession
    require(overwrite || !spark.catalog.tableExists(table),
      s"table $table already exists; pass overwrite = true to replace it")
    Layout.writeBucketed(degreeEdges(edges), table, "src", buckets, path)
    iterate(spark.table(table), iterations, damping, mergeHint = true)
  }

  /** The shared power-iteration loop over a materialized
    * degree-annotated edge frame. */
  private def iterate(withDeg: DataFrame, iterations: Int,
                      damping: Double, mergeHint: Boolean): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val nodes = withDeg.select(col("src").as("node")).distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    val teleport = (1.0 - damping) / n
    var ranks = nodes.select(col("node"), (lit(1.0) / n).as("rank"))
      .localCheckpoint(true)
    var i = 0
    while (i < iterations) {
      val contribs = contribStep(withDeg, ranks, mergeHint)
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
