package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Changelog merge (CDC upsert): apply a stream of keyed
 * insert/update/delete changes to a snapshot, latest version wins.
 * Extension surface (no reference counterpart) — the maintenance
 * operation every periodically-refreshed training corpus needs:
 * re-crawled documents replace stale ones, takedowns tombstone rows
 * out, and the merge must be deterministic so two clusters applying
 * the same changelog produce byte-identical corpora.
 *
 * Semantics: for each key, the surviving row is the one with the
 * highest `version`; ties break toward the CHANGE side (a change at
 * the same version as the snapshot supersedes it — re-delivery of the
 * already-applied version must be idempotent), then toward the larger
 * row by the remaining orderable columns (so exact duplicate
 * deliveries are a no-op, not a flap). If the winner is a tombstone
 * (`deleteCol` true), the key is dropped from the output.
 *
 * Scale shape: ONE hash shuffle of union(snapshot, changes) on the
 * key, window row_number inside each key partition, map-side filter.
 * No broadcast requirement on either side — changelogs can be
 * corpus-sized (full re-crawls). At 100 TB the union's snapshot side
 * is the dominant cost and is unavoidable for an exact merge without
 * a keyed storage layout; with [[Layout.writeBucketed]] on the key,
 * the shuffle of the snapshot side disappears and only the changelog
 * exchanges.
 */
object Upsert {

  /** Merge `changes` into `snapshot`, latest `versionCol` per `key`
    * winning and tombstones (`deleteCol`, optional) removing the key.
    * Both frames must share the key/version columns; data columns are
    * aligned by name (missing-in-one columns are nulled).
    *
    * `keepTombstones = true` RETAINS winning tombstones in the output
    * (with `deleteCol` preserved) instead of dropping the key — the
    * form incremental appliers need: a retained tombstone keeps
    * suppressing late-arriving older versions in subsequent merges,
    * where a dropped one would let them resurrect. Filter
    * `NOT deleteCol` for the clean view. */
  /** SCD Type-2 history build: turn a changelog into validity
    * intervals — one row per RUN of an unchanged tracked value per
    * key, with `valid_from`/`valid_to` (null = still current) and an
    * `is_current` flag. [[merge]] is Type 1 (latest wins, history
    * discarded); this keeps the history queryable, which is what a
    * point-in-time training-set join needs on the dimension side.
    *
    * Semantics: rows order per key by (`ordCol`, `tiebreakCol`);
    * consecutive rows whose `trackCol` is unchanged (null-safe
    * compare) collapse into the run's FIRST row; `valid_to` is the
    * next run's `valid_from` (half-open intervals — an as-of probe at
    * exactly valid_to reads the next run).
    *
    * Scale shape: two stacked lag/lead windows PARTITIONED BY the key
    * over the same sort — one shuffle total, the second window reuses
    * the first's ordering; no self-join, no global sort. */
  def scd2(changes: DataFrame, keyCol: String, trackCol: String,
           ordCol: String, tiebreakCol: String): DataFrame = {
    val clash = changes.columns.toSet
      .intersect(Set("__prev", "__rn", "valid_from", "valid_to", "is_current"))
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with scd2's output/temp names")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(ordCol).asc, col(tiebreakCol).asc)
    changes
      // row_number distinguishes "no previous row" from "previous
      // tracked value is null" — a run of nulls must still collapse
      .withColumn("__rn", row_number().over(w))
      .withColumn("__prev", lag(col(trackCol), 1).over(w))
      .where(col("__rn") === 1 || !(col(trackCol) <=> col("__prev")))
      .withColumn("valid_from", col(ordCol))
      .withColumn("valid_to", lead(col(ordCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__prev", "__rn")
  }

  def merge(snapshot: DataFrame, changes: DataFrame, key: String,
            versionCol: String, deleteCol: String = "",
            keepTombstones: Boolean = false): DataFrame = {
    require(!snapshot.columns.contains("__src") &&
      !changes.columns.contains("__src"),
      "input column __src collides with merge's reserved temp name")
    // a side without the tombstone column (typically the snapshot)
    // simply never deletes
    val withDel = (df: DataFrame) =>
      if (deleteCol.isEmpty || !df.columns.contains(deleteCol))
        df.withColumn("__del", lit(false))
      else df.withColumn("__del", coalesce(col(deleteCol).cast("boolean"),
        lit(false))).drop(deleteCol)
    val s = withDel(snapshot).withColumn("__src", lit(0))
    val c = withDel(changes).withColumn("__src", lit(1))
    val all = s.unionByName(c, allowMissingColumns = true)
    // deterministic winner: version desc, change-over-snapshot,
    // remaining orderable columns desc as the final tie-break
    import org.apache.spark.sql.catalyst.expressions.RowOrdering
    val rest = all.columns
      .filterNot(Set(key, versionCol, "__src", "__del").contains)
      .filter(cn => RowOrdering.isOrderable(all.schema(cn).dataType))
      .sorted
    val w = Window.partitionBy(col(key)).orderBy(
      (Seq(col(versionCol).desc, col("__src").desc) ++
        rest.map(col(_).desc_nulls_last)): _*)
    val winners = all.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
    if (keepTombstones)
      winners.withColumn(
        if (deleteCol.isEmpty) "__deleted" else deleteCol, col("__del"))
        .drop("__rn", "__del", "__src")
    else
      winners.where(!col("__del")).drop("__rn", "__del", "__src")
  }

  /** Continuous CDC apply: maintain a merged snapshot at `targetDir`
    * from a STREAM of changes. Each micro-batch runs [[merge]] of the
    * current snapshot with the batch (tombstones retained, so late
    * older versions stay suppressed across batches) and atomically
    * swaps the result in (write aside, delete, rename). Checkpointed:
    * a restart re-processes only unseen files.
    *
    * Semantics note: across batches a previously-applied change sits
    * on the SNAPSHOT side of the next merge, so an equal-version
    * re-delivery resolves by the change-wins rule — identical
    * re-deliveries are no-ops, and distinct versions make incremental
    * application equal to one-shot [[merge]] of the full changelog.
    *
    * Scale note: each batch rewrites the full snapshot — the exact
    * cost model of a copy-on-write table format without file pruning.
    * At 100 TB, partition `targetDir` by a key prefix and rewrite only
    * partitions the batch touches (or hand the same merge to a table
    * format with file-level merge-on-read); the merge plan itself is
    * already the one-key-shuffle shape either way. */
  def streamMerge(changes: DataFrame, targetDir: String,
                  checkpointDir: String, key: String, versionCol: String,
                  deleteCol: String = ""): org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = changes.sparkSession
    val delName = if (deleteCol.isEmpty) "__deleted" else deleteCol
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val conf = spark.sparkContext.hadoopConfiguration
        val target = new org.apache.hadoop.fs.Path(targetDir)
        val fs = target.getFileSystem(conf)
        val staged = new org.apache.hadoop.fs.Path(targetDir + "__staged")
        // crash recovery: a crash between delete and rename leaves the
        // merged state only in the staged dir — finish the swap first
        if (!fs.exists(target) && fs.exists(staged)) fs.rename(staged, target)
        val current =
          if (fs.exists(target)) spark.read.parquet(targetDir)
          else merge(batch.limit(0), batch.limit(0), key, versionCol,
            deleteCol, keepTombstones = true).limit(0)
        val merged = merge(current, batch, key, versionCol, delName,
          keepTombstones = true)
        merged.write.mode("overwrite").parquet(staged.toString)
        if (fs.exists(target)) fs.delete(target, true)
        if (!fs.rename(staged, target))
          sys.error(s"could not swap $staged into place at $target")
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
  }
}
