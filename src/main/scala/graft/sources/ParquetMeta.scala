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
 * stats themselves are exact for the fixed-width types (integral,
 * DATE, TIMESTAMP — parquet writes untruncated min/max for them),
 * which is what lets q185/q189 hold the footer numbers to a DuckDB
 * replay of the DATA — a census that disagrees with its own data
 * pages is a red oracle row. String/binary stats are BOUNDS (writers
 * may truncate long values); the skipping rule stays sound on bounds.
 */
object ParquetMeta {

  /** Per-row-group footer stats for one column: integral types land
    * in (col_min, col_max) as longs; UTF8-annotated binary in
    * (col_min_str, col_max_str) — these are BOUNDS, not necessarily
    * exact values (parquet writers may truncate long binary stats to
    * a prefix lower bound / incremented-prefix upper bound, and drop
    * them entirely past the serialization cap — absent stats surface
    * as nulls, never fabricated; the skipping rule below is sound on
    * bounds); DATE-annotated int32 in (col_min_date, col_max_date);
    * TIMESTAMP-annotated int64 (MILLIS/MICROS/NANOS) in (col_min_ts,
    * col_max_ts) — UTC-adjusted values decode as instants, NTZ
    * (local-semantics) values are anchored in the session timezone so
    * they display exactly as written under any session zone (see
    * [[tsOf]]). Unsupported types (int96, float, unannotated
    * binary) stay honest nulls across the board. Output: (file,
    * rg_idx, n_rows, col_min, col_max, col_min_str, col_max_str,
    * col_min_date, col_max_date, col_min_ts, col_max_ts, col_nulls,
    * compressed_bytes, total_bytes). Metadata only; one map stage
    * over the file list. */
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
    // NTZ decode anchor (see tsOf): the session zone is resolved
    // DRIVER-side once and rides the closure — Spark's TimestampType
    // formats instants in this zone, so anchoring an NTZ local value
    // here makes it display as written under ANY session timezone
    val sessionZone = spark.conf.get("spark.sql.session.timeZone",
      java.util.TimeZone.getDefault.getID)
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
              var smn: Option[String] = None; var smx: Option[String] = None
              var dmn: Option[java.sql.Date] = None
              var dmx: Option[java.sql.Date] = None
              var tmn: Option[java.sql.Timestamp] = None
              var tmx: Option[java.sql.Timestamp] = None
              var nulls: Option[Long] = None
              val cols = b.getColumns
              var c = 0
              while (c < cols.size()) {
                val cc = cols.get(c)
                if (cc.getPath.toDotString == column) {
                  val st = cc.getStatistics
                  if (st != null && !st.isEmpty) {
                    if (st.isNumNullsSet) nulls = Some(st.getNumNulls)
                    val ann = cc.getPrimitiveType.getLogicalTypeAnnotation
                    if (st.hasNonNullValue) (st.genericGetMin, st.genericGetMax) match {
                      case (a: java.lang.Long, z: java.lang.Long) =>
                        ann match {
                          case t: org.apache.parquet.schema
                              .LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
                            tmn = Some(tsOf(a.longValue, t.getUnit,
                              t.isAdjustedToUTC, sessionZone))
                            tmx = Some(tsOf(z.longValue, t.getUnit,
                              t.isAdjustedToUTC, sessionZone))
                          case _ =>
                            mn = Some(a.longValue); mx = Some(z.longValue)
                        }
                      case (a: java.lang.Integer, z: java.lang.Integer) =>
                        ann match {
                          case _: org.apache.parquet.schema
                              .LogicalTypeAnnotation.DateLogicalTypeAnnotation =>
                            dmn = Some(dateOf(a.intValue))
                            dmx = Some(dateOf(z.intValue))
                          case _ =>
                            mn = Some(a.longValue); mx = Some(z.longValue)
                        }
                      case (a: org.apache.parquet.io.api.Binary,
                            z: org.apache.parquet.io.api.Binary)
                          if ann.isInstanceOf[org.apache.parquet.schema
                            .LogicalTypeAnnotation.StringLogicalTypeAnnotation] =>
                        smn = Some(a.toStringUsingUTF8)
                        smx = Some(z.toStringUsingUTF8)
                      case _ => () // int96/float/raw binary: honest nulls
                    }
                  }
                }
                c += 1
              }
              (file, i, b.getRowCount, mn, mx, smn, smx, dmn, dmx,
                tmn, tmx, nulls, b.getCompressedSize, b.getTotalByteSize)
            }
          } finally reader.close()
        }
      }
      .toDF("file", "rg_idx", "n_rows", "col_min", "col_max",
        "col_min_str", "col_max_str", "col_min_date", "col_max_date",
        "col_min_ts", "col_max_ts",
        "col_nulls", "compressed_bytes", "total_bytes")
  }

  /** Epoch-days (parquet DATE) → java.sql.Date, timezone-proof via
    * LocalDate (a raw `new Date(days*86400000)` would shift across
    * the JVM default zone). */
  private def dateOf(days: Int): java.sql.Date =
    java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(days.toLong))

  /** Parquet TIMESTAMP int64 in its declared unit → java.sql.Timestamp
    * (floorDiv/floorMod so pre-epoch values keep exact sub-second
    * parts), honoring the annotation's `isAdjustedToUTC` flag:
    *
    *  - adjusted (instant semantics): the int64 counts units since the
    *    UTC epoch — decode directly, exactly as before.
    *  - NTZ (local semantics — what pandas/pyarrow write for naive
    *    datetimes): the same arithmetic yields a LOCAL wall-clock
    *    value, not an instant. Decoding it as UTC would shift the
    *    displayed value by the session-zone offset whenever the
    *    session timezone isn't UTC. Instead the local datetime is
    *    ANCHORED in the session zone (`sessionZone`, resolved
    *    driver-side), so Spark's TimestampType — which formats in that
    *    same zone — renders the value exactly as the writer recorded
    *    it, under any session timezone. */
  private[sources] def tsOf(v: Long,
                   unit: org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit,
                   adjustedToUtc: Boolean, sessionZone: String)
      : java.sql.Timestamp = {
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
    val (sec, nanos) = unit match {
      case TimeUnit.MILLIS =>
        (Math.floorDiv(v, 1000L), Math.floorMod(v, 1000L) * 1000000L)
      case TimeUnit.MICROS =>
        (Math.floorDiv(v, 1000000L), Math.floorMod(v, 1000000L) * 1000L)
      case TimeUnit.NANOS =>
        (Math.floorDiv(v, 1000000000L), Math.floorMod(v, 1000000000L))
    }
    if (adjustedToUtc) {
      val ts = new java.sql.Timestamp(sec * 1000L)
      ts.setNanos(nanos.toInt)
      ts
    } else {
      val local = java.time.LocalDateTime.ofEpochSecond(
        sec, nanos.toInt, java.time.ZoneOffset.UTC)
      java.sql.Timestamp.from(
        local.atZone(java.time.ZoneId.of(sessionZone)).toInstant)
    }
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

  /** [[skippingReport]] for a STRING range probe (text-keyed layouts —
    * the common crawl-corpus case). Sound even on truncated stats:
    * the footer's string min/max are lower/upper BOUNDS, so
    * `min > hi || max < lo` never skips a group that could match. */
  def skippingReportString(stats: DataFrame, lo: String,
                           hi: String): DataFrame = {
    import org.apache.spark.sql.functions._
    stats.withColumn("skippable",
      col("col_min_str").isNotNull && col("col_max_str").isNotNull &&
        (col("col_min_str") > hi || col("col_max_str") < lo))
  }
}
