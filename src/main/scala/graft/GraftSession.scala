package graft
import org.apache.spark.sql.SparkSession

/** ONE local-session factory for every driver-contract main (Bench,
  * Verify, Explain). A config required for correctness — like
  * `nanosAsLong`, without which Spark 4 rejects the events table's
  * TIMESTAMP(NANOS) — added to one main but not another would make
  * their executions silently diverge (Explain's printed plans must be
  * the plans Verify/Bench actually run). */
object GraftSession {
  def local(cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
