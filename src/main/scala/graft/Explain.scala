package graft
import org.apache.spark.sql.SparkSession

/** Plan auditor: prints `explain("formatted")` for every registered
  * query (or the names given as trailing args) so plan shape — pushed
  * filters, broadcast vs shuffle joins, codegen spans, exchange
  * counts — can be reviewed and pinned. PLANS.md is curated from this
  * output.
  *
  * Caveat: queries whose operators materialize eagerly (the
  * localCheckpoint family q22/q30/q47/q48 and the KMeans-fitting
  * q27/q53) EXECUTE that work during query construction and then show
  * only the post-checkpoint tail here; their pre-checkpoint plan
  * shapes are pinned by OpsSpec plan assertions instead (see
  * PLANS.md's checkpoint caveat). Prefer a small sfDir.
  *
  * Usage: runMain graft.Explain <sfDir> [queryName...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.local(cpus)
    names.foreach { n =>
      println(s"===== $n =====")
      try SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      catch { case e: Throwable =>
        println(s"[explain] $n failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
