package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Parquet FOOTER census — row-group statistics read from file
 * metadata only, zero data pages touched. This is the information
 * every skipping decision at 100 TB runs on (predicate pushdown
 * prunes row groups by exactly these min/max; compaction and z-order
 * planning ask "how selective WOULD the layout be"), surfaced as a
 * DataFrame so layout tooling (`ops/Layout`, `ops/ZOrder`) can reason
 * about it instead of re-scanning data.
 *
 * Scale shape: the file list parallelizes across the cluster and each
 * task opens only footers (a few KB at the file tail) — a census of a
 * million-file table costs a million metadata reads and no scan. The
 * stats themselves are exact for the integral types supported here
 * (parquet writes untruncated min/max for fixed-width types), which
 * is what lets q185 hold the footer numbers to a DuckDB replay of the
 * DATA — a census that disagrees with its own data pages is a red
 * oracle row.
 */
object ParquetMeta {

  /** Per-row-group footer stats for one integral column (int32/int64
    * — emitted as long; other types or absent stats surface as
    * nulls, never fabricated): (file, rg_idx, n_rows, col_min,
    * col_max, col_nulls, compressed_bytes, total_bytes). Metadata
    * only; one map stage over the file list. */
  def rowGroupStats(spark: SparkSession, path: String,
                    column: String): DataFrame = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    val files = {
      val it = fs.listFiles(root, true)
      val b = Seq.newBuilder[String]
      while (it.hasNext) {
        val f = it.next()
        if (f.isFile && f.getPath.getName.endsWith(".parquet"))
          b += f.getPath.toString
      }
      b.result()
    }
    require(files.nonEmpty, s"no parquet files under $path")
    // the DRIVER's Hadoop conf rides a broadcast to the tasks, so
    // credentialed object stores / custom filesystems work without a
    // deployment-side workaround (SerializableHadoopConf)
    val bcConf = SerializableHadoopConf.broadcast(spark)
    spark.createDataset(files)
      .repartition(math.min(files.size, 64))
      .mapPartitions { it =>
        val taskConf = bcConf.value.value
        it.flatMap { file =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(new org.apache.hadoop.fs.Path(file), taskConf)
          val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try {
            val footer = reader.getFooter
            val blocks = footer.getBlocks
            (0 until blocks.size()).map { i =>
              val b = blocks.get(i)
              var mn: Option[Long] = None; var mx: Option[Long] = None
              var nulls: Option[Long] = None
              val cols = b.getColumns
              var c = 0
              while (c < cols.size()) {
                val cc = cols.get(c)
                if (cc.getPath.toDotString == column) {
                  val st = cc.getStatistics
                  if (st != null && !st.isEmpty) {
                    if (st.isNumNullsSet) nulls = Some(st.getNumNulls)
                    if (st.hasNonNullValue) (st.genericGetMin, st.genericGetMax) match {
                      case (a: java.lang.Long, z: java.lang.Long) =>
                        mn = Some(a.longValue); mx = Some(z.longValue)
                      case (a: java.lang.Integer, z: java.lang.Integer) =>
                        mn = Some(a.longValue); mx = Some(z.longValue)
                      case _ => () // non-integral: honest nulls
                    }
                  }
                }
                c += 1
              }
              (file, i, b.getRowCount, mn, mx, nulls,
                b.getCompressedSize, b.getTotalByteSize)
            }
          } finally reader.close()
        }
      }
      .toDF("file", "rg_idx", "n_rows", "col_min", "col_max",
        "col_nulls", "compressed_bytes", "total_bytes")
  }

  /** Footer-based skipping report for a range probe `[lo, hi]` on the
    * census column: per row group, whether predicate pushdown WOULD
    * skip it (min > hi or max < lo — the parquet reader's own rule).
    * Pure column arithmetic over [[rowGroupStats]] output. */
  def skippingReport(stats: DataFrame, lo: Long, hi: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    stats.withColumn("skippable",
      col("col_min").isNotNull && col("col_max").isNotNull &&
        (col("col_min") > hi || col("col_max") < lo))
  }
}
