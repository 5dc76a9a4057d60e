package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic, leakage-safe dataset splitting — the contamination
 * control a training pipeline needs: rows are assigned to
 * train/val/test by a hash of a GROUP key (source, domain, document
 * family), so correlated rows can never straddle a split boundary.
 *
 * Hash choice: md5 (first 8 hex chars → int) instead of xxhash64
 * because it is bit-identical across engines (the DuckDB oracle
 * replays the same arithmetic; Spark's xxhash64 seed/variant has no
 * DuckDB counterpart). Assignment is a pure per-row expression —
 * codegen, no shuffle, stable across runs/cluster sizes/partitioning,
 * unlike `randomSplit` whose output depends on partition layout.
 */
object Splits {

  /** Bucket in [0, buckets) from the md5 of the (stringified) key. */
  def hashBucket(key: Column, buckets: Int): Column =
    conv(substring(md5(key.cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long") % buckets

  /**
   * Split assignment column: `weights` are (name, share) pairs; a key
   * hashing into the first `share_1` of `sum(shares)` buckets gets the
   * first name, and so on. Example: Seq(("train", 8), ("val", 1),
   * ("test", 1)) → 80/10/10 by group.
   */
  def assignment(key: Column, weights: Seq[(String, Int)]): Column = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "weights must be positive")
    val total = weights.map(_._2).sum
    val bucket = hashBucket(key, total)
    val cuts = weights.scanLeft(0)(_ + _._2).tail // cumulative upper bounds
    weights.zip(cuts).init.foldRight(lit(weights.last._1): Column) {
      case (((name, _), cut), rest) => when(bucket < cut, name).otherwise(rest)
    }
  }

  /** Attach `outCol` with the split name per row, grouped by `groupCol`. */
  def assign(df: DataFrame, groupCol: String,
             weights: Seq[(String, Int)] = Seq(("train", 8), ("val", 1), ("test", 1)),
             outCol: String = "split"): DataFrame =
    df.withColumn(outCol, assignment(col(groupCol), weights))

  /**
   * Deterministic training-order sharding: every row gets a
   * reproducible (shard, sort_key) from a seeded 60-bit md5 hash of
   * its key — the "global shuffle" a training run needs (reproducible
   * example order across re-runs, resumable epochs, shard-parallel
   * readers) WITHOUT a global sort. Assignment is a pure per-row
   * codegen expression; a writer materializes the order as
   * `repartition(shards, col(shardCol)).sortWithinPartitions(orderCol)`
   * — one shuffle at write time, no single-task windows, no driver
   * state. Stable across partition layout, cluster size, and run
   * count, unlike `orderBy(rand(seed))` (layout-dependent) or
   * `randomSplit` ordering. Same md5 rationale as [[hashBucket]]: the
   * DuckDB oracle replays the arithmetic bit-for-bit.
   */
  def shardOrder(df: DataFrame, keyCol: String, shards: Int,
                 seed: Long = 0, shardCol: String = "shard",
                 orderCol: String = "sort_key"): DataFrame = {
    require(shards > 0, "shards must be positive")
    require(!df.columns.contains(shardCol) && !df.columns.contains(orderCol),
      s"input already has a $shardCol/$orderCol column")
    val h = conv(substring(md5(
      concat_ws(":", lit(seed), col(keyCol).cast("string")).cast("binary")),
      1, 15), 16, 10).cast("decimal(38,0)").cast("long")
    df.withColumn(orderCol, h)
      .withColumn(shardCol, pmod(col(orderCol), lit(shards)).cast("int"))
  }

  /**
   * Split-leakage audit: which near-duplicate pairs STRADDLE a split
   * boundary — the eval-contamination check a per-document hash split
   * cannot make on its own (two near-identical documents have
   * different ids, hash independently, and can land one in train and
   * one in test; a model then "generalizes" to text it effectively
   * saw). Feed it a near-dup pair frame (MinHash/SimHash/semantic —
   * any (id_a, id_b) output) and the same `weights` the split used;
   * the assignment is recomputed as the pure [[assignment]]
   * expression, so the audit is MAP-ONLY over the (already small)
   * pair frame — no join against the corpus, no shuffle. Returns the
   * leaking pairs; an empty result certifies the split. The fix for a
   * non-empty result is group-keyed assignment by near-dup CLUSTER
   * ([[graft.ops.Dedup.componentsOf]] → [[assign]] on the component
   * id), which this audit then certifies.
   */
  def nearDupLeakage(pairs: DataFrame, idColA: String, idColB: String,
                     weights: Seq[(String, Int)] = Seq(("train", 8), ("val", 1), ("test", 1)))
      : DataFrame = {
    require(!pairs.columns.contains("split_a") && !pairs.columns.contains("split_b"),
      "input already has a split_a/split_b column")
    pairs
      .withColumn("split_a", assignment(col(idColA), weights))
      .withColumn("split_b", assignment(col(idColB), weights))
      .where(col("split_a") =!= col("split_b"))
  }

  /**
   * Cluster-keyed split assignment — the fix [[nearDupLeakage]]
   * prescribes, as an operator: close the near-dup pair graph into
   * components ([[graft.ops.Dedup]]'s min-label propagation), key
   * every row by its component representative (singletons by their
   * own id), and assign splits by THAT key. Two near-duplicates then
   * share a cluster id by construction, so no near-dup pair can
   * straddle a split boundary — [[nearDupLeakage]] on the output
   * assignment is empty, certifiably.
   *
   * Scale shape: the component label frame only holds ids that appear
   * in some pair — tiny against a mostly-unique corpus — so the
   * tag-back is a BROADCAST left join (same argument as
   * `Dedup.nearDupClusters`); the assignment itself stays the pure
   * codegen md5 expression of [[assignment]].
   */
  def assignByCluster(df: DataFrame, idCol: String, pairs: DataFrame,
                      idColA: String = "id_a", idColB: String = "id_b",
                      weights: Seq[(String, Int)] = Seq(("train", 8), ("val", 1), ("test", 1)),
                      outCol: String = "split",
                      clusterCol: String = "cluster_id"): DataFrame = {
    require(!df.columns.contains(clusterCol) && !df.columns.contains(outCol),
      s"input already has a $clusterCol/$outCol column")
    val comps = Dedup.componentsOf(
        pairs.select(col(idColA).as("id_a"), col(idColB).as("id_b")))
      .withColumnRenamed("node", idCol)
    df.join(org.apache.spark.sql.functions.broadcast(comps), Seq(idCol), "left")
      .withColumn(clusterCol, coalesce(col("comp"), col(idCol)))
      .drop("comp")
      .withColumn(outCol, assignment(col(clusterCol), weights))
  }
}
