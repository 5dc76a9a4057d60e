package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for two-dimensional data
  * skipping — the lakehouse `OPTIMIZE ZORDER BY` primitive.
  *
  * A linear sort on column X gives perfect file skipping for X-range
  * probes and none for Y; interleaving the quantized bits of X and Y
  * and clustering by the resulting curve value gives useful min/max
  * pruning on BOTH columns. Everything here is exact integer
  * arithmetic (quantization by integer division, interleave by
  * shift/mask), so the whole pipeline is SQL-replayable and
  * engine-portable.
  *
  * Scale shape (100 TB): quantization bounds are ONE aggregate row
  * broadcast back onto the scan (the single-row cross, q50/q52
  * pattern); the z-value and both file assignments are pure codegen
  * projections; the per-file stats are partial+final hash aggregates
  * over file-count-sized groups. The corpus is scanned once and never
  * sorted — static z-prefix binning stands in for the production
  * writer's range partitioning so the report is deterministic.
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative longs:
    * result bit 2i = bit i of `xq`, bit 2i+1 = bit i of `yq`. */
  def interleaved(xq: Column, yq: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(xq, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(yq, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Min-max quantization of `c` onto [0, 2^bits - 1] by exact
    * integer division (both bounds supplied as columns; degenerate
    * min==max ranges map everything to 0). */
  def quantized(c: Column, minC: Column, maxC: Column, bits: Int): Column = {
    val lim = (1L << bits) - 1
    val span = maxC - minC
    val num = (c - minC) * lim
    // Exact integer division via pmod: (num - num%span) is exactly
    // divisible, and IEEE division of exactly-divisible doubles below
    // 2^53 returns the integer quotient exactly — no floor-of-float
    // boundary drift vs the oracle's `//`.
    when(span === 0, lit(0L))
      .otherwise(((num - pmod(num, span)) / span).cast("long"))
  }

  /** Production clustering path: cluster rows by z-value into
    * `numFiles` range partitions, each locally sorted by the curve, and
    * write parquet. Range boundaries come from Spark's sampling
    * partitioner (fine for a writer; NOT used by the deterministic
    * report below). */
  def writeClustered(df: DataFrame, xCol: String, yCol: String,
                     path: String, numFiles: Int, bits: Int = 8): Unit = {
    val stats = df.agg(
      min(col(xCol)).as("__xmin"), max(col(xCol)).as("__xmax"),
      min(col(yCol)).as("__ymin"), max(col(yCol)).as("__ymax"))
    val z = interleaved(
      quantized(col(xCol), col("__xmin"), col("__xmax"), bits),
      quantized(col(yCol), col("__ymin"), col("__ymax"), bits), bits)
    df.crossJoin(broadcast(stats))
      .withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__xmin", "__xmax", "__ymin", "__ymax", "__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Data-skipping comparison: assign every row to a file under (a) a
    * linear x-sorted layout (file = top bits of quantized x) and (b) a
    * z-order layout (file = top bits of the Morton value), then count
    * how many files a min/max-pruned scan must read for an x-range
    * probe and for a y-range probe. The probe band is
    * [probeLoPct, probeHiPct] percent of each axis's quantized domain.
    *
    * Output: (layout, n_files, files_hit_x, files_hit_y, n_rows),
    * one row per layout.
    */
  def skippingReport(df: DataFrame, xCol: String, yCol: String,
                     bits: Int = 8, fileBits: Int = 4,
                     probeLoPct: Int = 40, probeHiPct: Int = 45): DataFrame = {
    require(fileBits >= 1 && fileBits <= bits,
      s"fileBits must be in [1, $bits]: $fileBits")
    val lim = (1L << bits) - 1
    val pLo = lim * probeLoPct / 100
    val pHi = lim * probeHiPct / 100
    val stats = df.agg(
      min(col(xCol)).as("__xmin"), max(col(xCol)).as("__xmax"),
      min(col(yCol)).as("__ymin"), max(col(yCol)).as("__ymax"))
    val qd = df.crossJoin(broadcast(stats))
      .select(
        quantized(col(xCol), col("__xmin"), col("__xmax"), bits).as("xq"),
        quantized(col(yCol), col("__ymin"), col("__ymax"), bits).as("yq"))
      .select(col("xq"), col("yq"),
        shiftright(interleaved(col("xq"), col("yq"), bits),
          2 * bits - fileBits).as("zfile"),
        shiftright(col("xq"), bits - fileBits).as("lfile"))

    def report(label: String, fileCol: String): DataFrame =
      qd.groupBy(col(fileCol).as("file"))
        .agg(min("xq").as("mnx"), max("xq").as("mxx"),
          min("yq").as("mny"), max("yq").as("mxy"),
          count(lit(1)).as("n"))
        .agg(
          count(lit(1)).as("n_files"),
          sum(when(col("mnx") <= pHi && col("mxx") >= pLo, 1L)
            .otherwise(0L)).as("files_hit_x"),
          sum(when(col("mny") <= pHi && col("mxy") >= pLo, 1L)
            .otherwise(0L)).as("files_hit_y"),
          sum(col("n")).as("n_rows"))
        .select(lit(label).as("layout"), col("n_files"),
          col("files_hit_x"), col("files_hit_y"), col("n_rows"))

    report("linear", "lfile").unionByName(report("zorder", "zfile"))
      .orderBy("layout")
  }
}
