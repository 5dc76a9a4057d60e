package graft
import org.apache.spark.sql.SparkSession

/** Benchmark harness: runs every declared query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line. A query that throws is
  * reported with an `errors` marker (and its elapsed time excluded from
  * the total) instead of masquerading as a fast success. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup so the first timed query doesn't absorb JVM/
    // codegen/scan initialization: touch codegen, shuffle machinery,
    // and each input table's footer once.
    try {
      import org.apache.spark.sql.functions._
      spark.range(2000000).groupBy((col("id") % 10).as("k"))
        .agg(sum("id")).collect()
      Seq("lineitem", "orders", "customer", "supplier", "part", "nation",
        "region", "events", "documents", "embeddings").foreach { n =>
        spark.read.parquet(s"$sfDir/$n.parquet").limit(1).collect()
      }
    } catch { case _: Throwable => () }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val error: Option[String] =
        try { fn(spark, sfDir).count(); None }
        catch { case e: Throwable =>
          Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(120))
        }
      (name, (System.nanoTime() - t0) / 1e9, error)
    }
    val ok = results.filter(_._3.isEmpty)
    val qs = ok.map { case (k, v, _) => s"\"$k\":$v" }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(m)) =>
      s"\"$k\":\"${m.replaceAll("[\"\\\\\\n\\r\\t]", " ")}\""
    }.mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
