package graft

/** Diagnostic main: runs the q57 curation pipeline against a scale-
  * factor dir and prints per-stage wall-clock (the `StageStat.elapsedMs`
  * monitoring surface) — the tool for attributing q57 bench drift to a
  * stage. Round-11 profile at sf0.1/32 threads: the four row-local
  * gates are fused into one materialization (logged on the novelty
  * row), leaving 7 persist+agg jobs; the fused front is the largest
  * single cost (it pays the source scan + embedding join), the rest
  * is the composition plus the band-index build, not any one
  * operator.
  *
  * Usage: runMain graft.CurateTiming [sfDir]
  */
object CurateTiming {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val spark = graft.GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def t(n: String) = spark.read.parquet(s"$dir/$n.parquet")
    val docs = t("documents")
    val emb = t("embeddings").select(col("vec_id").as("doc_id"), col("embedding"))
    val hist = docs.filter(col("doc_id") % 5 === 0)
    val input = docs.filter(col("doc_id") % 5 =!= 0).join(emb, Seq("doc_id"))
    val benchmark = docs.filter(col("doc_id") % 101 === 0)
    val w0 = System.nanoTime()
    val bandIdx = graft.ops.Novelty.fitBandIndex(hist, "text", fpp = 1e-6)
    println(s"fitBandIndex: ${(System.nanoTime()-w0)/1e9}")
    val (out, report) = graft.ops.Curate.standard(input, benchmark,
      historicalCorpus = Some(hist), bandIndex = Some(bandIdx),
      maxAvgNegLogp = Some(9.0), semanticVecCol = Some("embedding"),
      semanticThreshold = 0.99, semanticNlist = 16)
    out.unpersist()
    report.stats.foreach(s => println(f"STAGE ${s.name}%-16s ${s.rows}%7d ${s.elapsedMs}%6d ms"))
    println(s"TOTAL ${(System.nanoTime()-w0)/1e9}")
    spark.stop()
  }
}
