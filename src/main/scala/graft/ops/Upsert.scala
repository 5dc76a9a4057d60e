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
    * aligned by name (missing-in-one columns are nulled). */
  def merge(snapshot: DataFrame, changes: DataFrame, key: String,
            versionCol: String, deleteCol: String = ""): DataFrame = {
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
    all.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1 && !col("__del"))
      .drop("__rn", "__del", "__src")
  }
}
