package graft

import org.apache.spark.sql.SparkSession

/** Shared local SparkSession for suites that need one (getOrCreate, so
  * all suites in the forked test JVM reuse a single context). */
trait SparkTestSession {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def resourcePath(name: String): String =
    getClass.getResource(name).getPath
}
