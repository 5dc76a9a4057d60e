package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestSession
import graft.ops.{Curate, Decontaminate, Novelty, TextStats}

/** The streaming ingest gate ([[graft.ops.Curate.streamingGate]]) is
  * the SAME transformation for batch and streaming inputs; this spec
  * closes the loop by actually running it as a file-source stream
  * (availableNow, append mode, no watermark, no state) with every fit
  * artifact active — static historical corpus (stream-static
  * anti-join), band index (broadcast Bloom probe), unigram reference
  * model, exact benchmark gram set — and asserting the admitted id
  * set equals the batch run over the same files. */
class CurateGateSpec extends AnyFunSuite with SparkTestSession {

  test("streamed ingest gate (availableNow) equals the batch gate, all artifacts active") {
    val src = java.nio.file.Paths.get("/root/testdata/sf0.001/documents.parquet")
    val d = java.nio.file.Files.createTempDirectory("graft-gate-stream")
    java.nio.file.Files.copy(src, d.resolve(src.getFileName))
    val dir = d.toString

    val docs = spark.read.parquet(dir)
    val hist = docs.filter(col("doc_id") % 5 === 0)
    val bench = docs.filter(col("doc_id") % 101 === 0)
    val model = TextStats.fitUnigramRef(hist, "text", 4096)
    val grams = Decontaminate.fitBenchGrams(bench, "text", 5)
    val idx = Novelty.fitBandIndex(hist, "text", fpp = 1e-6)

    def gate(df: org.apache.spark.sql.DataFrame) =
      Curate.streamingGate(df,
        minQuality = 0.3, maxDup2gramFrac = 0.3,
        historicalCorpus = Some(hist), bandIndex = Some(idx),
        unigramRef = Some((model, 9.0)), benchGrams = Some(grams))

    val batch = gate(docs).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(batch.nonEmpty, "fixture admits no documents — gate too tight")
    // the gate actually gates: the historical docs at least are
    // dropped by the exact-novelty stage
    assert(batch.size < docs.count())

    val streamedDf = gate(
      spark.readStream.schema(docs.schema).parquet(dir))
    assert(streamedDf.isStreaming)
    val q = EventStreams.runOnce(spark, streamedDf, "curate_gate_stream",
      OutputMode.Append())
    q.awaitTermination(120000)
    val streamed = spark.table("curate_gate_stream").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(streamed === batch)
  }

  test("misra-gries aggregate streams: Complete-mode candidates equal the batch pass") {
    // the UDAF is a TypedImperativeAggregate, so it runs as a normal
    // streaming aggregation — the heavy-hitter candidate sketch over
    // an unbounded source with O(k) state, exactly the monitoring
    // shape the operator exists for
    val src = java.nio.file.Paths.get("/root/testdata/sf0.001/documents.parquet")
    val d = java.nio.file.Files.createTempDirectory("graft-mg-stream")
    java.nio.file.Files.copy(src, d.resolve(src.getFileName))
    val docs = spark.read.parquet(d.toString)
    def tokensOf(df: org.apache.spark.sql.DataFrame) =
      df.select(explode(graft.ops.Dedup.normalizedTokens(col("text")))
        .as("token"))
    def mg(df: org.apache.spark.sql.DataFrame) =
      tokensOf(df).agg(
        graft.ops.Frequent.candidatesAgg(col("token"), 50).as("cand"))
    val batch = mg(docs).collect().head.getSeq[String](0)
    assert(batch.nonEmpty)
    val q = EventStreams.runOnce(spark,
      mg(spark.readStream.schema(docs.schema).parquet(d.toString)),
      "mg_stream", OutputMode.Complete())
    q.awaitTermination(120000)
    val streamed = spark.table("mg_stream")
      .collect().head.getSeq[String](0)
    // single micro-batch => identical update sequence => identical
    // candidate set (across many micro-batches the sets could differ
    // within the MG guarantee; availableNow over one file is one batch)
    assert(streamed === batch)
  }
}
