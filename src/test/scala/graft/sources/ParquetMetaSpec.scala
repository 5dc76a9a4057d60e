package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** Footer census: metadata-only stats agree with the data, honest
  * nulls for unsupported types, and the pushdown skipping rule. */
class ParquetMetaSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private def tmpDir(): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("graft_pqmeta_")

  private def rm(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
      .foreach(f => java.nio.file.Files.deleteIfExists(f))
  }

  test("row-group stats equal the data: counts, min/max, null counts") {
    val t = tmpDir()
    try {
      val df = Seq[(java.lang.Long, String)](
        (10L, "a"), (20L, "b"), (null, "c"), (5L, "d"))
        .toDF("k", "s")
      df.coalesce(1).write.parquet(t.resolve("p").toString)
      val stats = ParquetMeta.rowGroupStats(spark, t.resolve("p").toString, "k")
        .collect()
      assert(stats.length === 1)
      val r = stats(0)
      assert(r.getAs[Long]("n_rows") === 4)
      assert(r.getAs[Long]("col_min") === 5L)
      assert(r.getAs[Long]("col_max") === 20L)
      assert(r.getAs[Long]("col_nulls") === 1L)
      assert(r.getAs[Long]("compressed_bytes") > 0)
      // a string column yields honest nulls, never fabricated numbers
      val sstats = ParquetMeta.rowGroupStats(spark, t.resolve("p").toString, "s")
        .collect()(0)
      assert(sstats.isNullAt(sstats.fieldIndex("col_min")))
      assert(sstats.getAs[Long]("n_rows") === 4)
    } finally rm(t)
  }

  test("multi-file census + skipping report implement the pushdown rule") {
    val t = tmpDir()
    try {
      (0L until 100L).toDF("k")
        .withColumn("part", (col("k") / 25).cast("int"))
        .repartition(col("part"))
        .write.partitionBy("part").parquet(t.resolve("p").toString)
      val stats = ParquetMeta.rowGroupStats(spark, t.resolve("p").toString, "k")
      assert(stats.count() === 4)
      // probe [30, 40]: only the part holding 25-49 can match
      val rep = ParquetMeta.skippingReport(stats, lo = 30, hi = 40)
        .withColumn("part",
          regexp_extract(col("file"), "part=(\\d+)", 1).cast("int"))
        .select("part", "skippable")
        .collect().map(r => r.getInt(0) -> r.getBoolean(1)).toMap
      assert(rep === Map(0 -> true, 1 -> false, 2 -> true, 3 -> true))
      // int32 stats widen to long
      val mn = ParquetMeta.rowGroupStats(spark,
        t.resolve("p").toString + "/part=2", "k")
        .collect()(0)
      assert(mn.getAs[Long]("col_min") === 50L &&
        mn.getAs[Long]("col_max") === 74L)
    } finally rm(t)
  }

  test("string/date/timestamp footer stats decode their logical types") {
    val t = tmpDir()
    val prevTs = spark.conf.get("spark.sql.parquet.outputTimestampType")
    try {
      // INT96 carries no usable stats — write the annotated int64 form
      spark.conf.set("spark.sql.parquet.outputTimestampType",
        "TIMESTAMP_MICROS")
      val df = Seq(
        ("banana", java.sql.Date.valueOf("2026-01-05"),
          java.sql.Timestamp.valueOf("2026-01-05 10:30:00.123456")),
        ("apple", java.sql.Date.valueOf("2025-12-31"),
          java.sql.Timestamp.valueOf("2025-12-31 23:59:59.5")),
        ("cherry", java.sql.Date.valueOf("2026-02-01"),
          java.sql.Timestamp.valueOf("2026-02-01 00:00:00")))
        .toDF("s", "d", "ts")
      val p = t.resolve("typed").toString
      df.coalesce(1).write.parquet(p)
      val sStats = ParquetMeta.rowGroupStats(spark, p, "s").head()
      assert(sStats.getAs[String]("col_min_str") === "apple")
      assert(sStats.getAs[String]("col_max_str") === "cherry")
      assert(sStats.isNullAt(sStats.fieldIndex("col_min"))) // honest null
      val dStats = ParquetMeta.rowGroupStats(spark, p, "d").head()
      assert(dStats.getAs[java.sql.Date]("col_min_date").toString
        === "2025-12-31")
      assert(dStats.getAs[java.sql.Date]("col_max_date").toString
        === "2026-02-01")
      val tsStats = ParquetMeta.rowGroupStats(spark, p, "ts").head()
      assert(tsStats.getAs[java.sql.Timestamp]("col_min_ts")
        === java.sql.Timestamp.valueOf("2025-12-31 23:59:59.5"))
      assert(tsStats.getAs[java.sql.Timestamp]("col_max_ts")
        === java.sql.Timestamp.valueOf("2026-02-01 00:00:00"))
      // string skipping rule: the whole group sits below the probe
      val rep = ParquetMeta.skippingReportString(
        ParquetMeta.rowGroupStats(spark, p, "s"), "x", "z")
      assert(rep.head().getAs[Boolean]("skippable"))
      val repHit = ParquetMeta.skippingReportString(
        ParquetMeta.rowGroupStats(spark, p, "s"), "a", "b")
      assert(!repHit.head().getAs[Boolean]("skippable"))
    } finally {
      spark.conf.set("spark.sql.parquet.outputTimestampType", prevTs)
      rm(t)
    }
  }

  test("driver Hadoop conf keys are visible inside tasks (broadcast conf)") {
    // the wrapper itself: a non-default driver key survives Java
    // serialization (Configuration is Writable, not Serializable —
    // the custom hooks carry it)
    val conf = new org.apache.hadoop.conf.Configuration(false)
    conf.set("graft.test.probe", "r15")
    val bo = new java.io.ByteArrayOutputStream()
    val oo = new java.io.ObjectOutputStream(bo)
    oo.writeObject(new SerializableHadoopConf(conf)); oo.close()
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bo.toByteArray))
      .readObject().asInstanceOf[SerializableHadoopConf]
    assert(back.value.get("graft.test.probe") === "r15")
    // the mechanism both call sites use (ParquetMeta.rowGroupStats,
    // Warc.writeWetGz): a key set on the DRIVER's session conf is
    // read back INSIDE a task through the broadcast — the object-
    // store credential path, provable without an object store
    spark.sparkContext.hadoopConfiguration.set("graft.test.task.key", "v15")
    try {
      val bc = SerializableHadoopConf.broadcast(spark)
      val seen = spark.range(0, 4, 1, 2)
        .mapPartitions { _ =>
          Iterator.single(
            Option(bc.value.value.get("graft.test.task.key")).getOrElse(""))
        }
        .collect().toSet
      assert(seen === Set("v15"))
    } finally spark.sparkContext.hadoopConfiguration.unset("graft.test.task.key")
  }

  test("NTZ timestamps anchor in the session zone; adjusted stay instants") {
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
    // 1995-06-17 12:34:56.789 as micros-since-epoch wall-clock digits
    val local = java.time.LocalDateTime.of(1995, 6, 17, 12, 34, 56,
      789000000)
    val micros = local.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
      789000L
    def wallClockIn(ts: java.sql.Timestamp, zone: String): String =
      ts.toInstant.atZone(java.time.ZoneId.of(zone)).toLocalDateTime.toString
    // NTZ (local semantics): under ANY session zone, the decoded value
    // must display exactly the wall-clock the writer recorded — the
    // old UTC-instant decode shifted it by the zone offset
    Seq("UTC", "America/New_York", "Asia/Tokyo").foreach { z =>
      val ts = ParquetMeta.tsOf(micros, TimeUnit.MICROS,
        adjustedToUtc = false, sessionZone = z)
      assert(wallClockIn(ts, z) === "1995-06-17T12:34:56.789",
        s"NTZ decode shifted under session zone $z")
    }
    // UTC-adjusted (instant semantics): the zone must NOT move the
    // instant — same epoch millis regardless of session zone
    val i1 = ParquetMeta.tsOf(micros, TimeUnit.MICROS,
      adjustedToUtc = true, sessionZone = "UTC")
    val i2 = ParquetMeta.tsOf(micros, TimeUnit.MICROS,
      adjustedToUtc = true, sessionZone = "Asia/Tokyo")
    assert(i1.getTime === i2.getTime && i1.getNanos === i2.getNanos)
    assert(wallClockIn(i1, "UTC") === "1995-06-17T12:34:56.789")
    // pre-epoch NANOS keep exact sub-second parts through floorDiv
    val pre = ParquetMeta.tsOf(-1L, TimeUnit.NANOS,
      adjustedToUtc = true, sessionZone = "UTC")
    assert(wallClockIn(pre, "UTC") === "1969-12-31T23:59:59.999999999")
  }

  test("missing or empty paths fail loudly") {
    intercept[java.io.FileNotFoundException] {
      ParquetMeta.rowGroupStats(spark, "/tmp/graft_definitely_absent", "k")
    }
    val t = tmpDir() // exists but holds no parquet
    try {
      val e = intercept[IllegalArgumentException] {
        ParquetMeta.rowGroupStats(spark, t.toString, "k")
      }
      assert(e.getMessage.contains("no parquet files"))
    } finally rm(t)
  }
}
