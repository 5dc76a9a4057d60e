package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Distributed element-wise aggregation over embedding columns —
 * centroid computation per cluster/group (the building block for IVF
 * index maintenance, cluster quality monitoring, and class-prototype
 * features). Extension surface beyond the reference.
 *
 * Scale design: posexplode turns each vector into narrow
 * (cluster, pos, value) rows; the mean is ONE partial+final hash
 * aggregate keyed by (cluster, pos) — shuffle width is bounded by
 * #clusters x dims, not by corpus size, and the map-side combine
 * collapses each partition's contribution to at most one row per key
 * before anything moves. No vector ever travels through a shuffle.
 */
object VectorAgg {

  /** The shared first aggregate: per-(cluster, position) mean and
    * vector count — both public shapes derive from this frame, so the
    * oracle-checked digest can never desynchronize from the centroid
    * computation itself. */
  private def posMeans(df: DataFrame, clusterCol: String,
                       vecCol: String): DataFrame =
    df.select(col(clusterCol).as("cluster"),
      posexplode(col(vecCol).cast("array<double>")).as(Seq("__pos", "__x")))
      .groupBy(col("cluster"), col("__pos"))
      .agg(avg(col("__x")).as("__m"), count(lit(1)).as("__n"))

  /** Per-cluster element-wise mean vectors: (cluster, n_vecs, centroid).
    * The centroid array is reassembled from the per-position means by
    * sorting (pos, mean) structs — `sort_array` on structs orders by
    * the first field, so the array index order is exact. */
  def centroids(df: DataFrame, clusterCol: String, vecCol: String): DataFrame =
    posMeans(df, clusterCol, vecCol)
      .groupBy(col("cluster"))
      .agg(
        max(col("__n")).as("n_vecs"),
        transform(
          sort_array(collect_list(struct(col("__pos"), col("__m")))),
          s => s.getField("__m")).as("centroid"))

  /** Oracle-checkable digest of [[centroids]]: vector count, dims, and
    * the centroid's L2 norm per cluster. */
  def centroidDigest(df: DataFrame, clusterCol: String, vecCol: String): DataFrame =
    posMeans(df, clusterCol, vecCol)
      .groupBy(col("cluster"))
      .agg(
        max(col("__n")).as("n_vecs"),
        count(lit(1)).as("dims"),
        round(sqrt(sum(col("__m") * col("__m"))), 4).as("centroid_l2"))
}
