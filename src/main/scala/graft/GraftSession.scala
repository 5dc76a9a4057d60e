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
      // Shuffle writer choice (r18 profile): with R <= 200 reduce
      // partitions Spark picks BypassMergeSortShuffleWriter, which
      // opens one temp file PER REDUCE PARTITION per map task and then
      // concatenates them — R+2 file-metadata ops per task. Thread
      // samples during the streaming-tail lifecycles showed 44/51
      // RUNNABLE executor frames inside that writer's file open/merge
      // path (DiskBlockObjectWriter.initialize, copyFileStreamNIO):
      // a many-small-stage battery pays O(stages x tasks x R) metadata
      // ops. Threshold 1 forces the sort-based writer — one spill file
      // + one index per map task, O(R) fewer metadata ops — at every
      // scale; large-R production shuffles (R > 200) never used the
      // bypass writer anyway, so this only changes the small-R regime
      // where the bypass writer's file fan-out is the known cost.
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BYPASS_THRESHOLD", "1"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
