package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestSession

/** Novelty gates: exact (md5 anti-join) and near-dup (band Bloom)
  * ingest filters, batch and streamed forms agreeing. */
class NoveltySpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "completely different content about spark engines"))
    .toDF("doc_id", "text")

  private lazy val incoming = Seq(
    (10L, "THE QUICK  BROWN fox jumps over the lazy dog"), // dup modulo case/ws
    (11L, "the quick brown fox jumps over the lazy cat"),  // near dup only
    (12L, "entirely novel text with no relation whatsoever"))
    .toDF("doc_id", "text")

  test("exact novelty drops normalized duplicates, keeps near dups") {
    val out = Novelty.exactNovel(incoming, corpus, "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(out === Seq(11L, 12L))
  }

  test("near novelty drops band-colliding near dups, keeps novel docs") {
    // fpp tightened: at the default 1e-3 this 12-key filter false-
    // positived on one of the novel doc's band keys under the md5
    // seed family — the novel doc was dropped by Bloom noise, not by
    // a real band collision (the python replay model shows 0 hits)
    val idx = Novelty.fitBandIndex(corpus, "text",
      shingleSize = 2, numHashes = 12, bands = 6, fpp = 1e-9)
    val out = Novelty.nearNovel(incoming, idx, "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(out === Seq(12L)) // 10 exact, 11 near — both collide
  }

  test("streaming curation chain: novelty gate -> span mask -> blocklist, streamed == batch") {
    // the streaming-safe ops COMPOSE on one stream: each stage is a
    // map-only (or stream-static) transform, so the whole chain runs
    // as a single streaming query — the ingest-side curation shape
    val docs = Seq(
      (10L, "old doc body", "x"), // exact dup of corpus -> gated out
      (20L, "shared license header words here plus alpha unique tail", "x"),
      (21L, "shared license header words here plus beta ending", "x"),
      (22L, "fresh text mentioning forbidden things", "x"))
      .toDF("doc_id", "text", "src")
    val hist = Seq((1L, "old doc body")).toDF("doc_id", "text")
    val spanIdx = SpanDedup.fitSpanIndex(docs, "doc_id", "text", 5, 2)
    val d = java.nio.file.Files.createTempDirectory("curate-stream").toString
    docs.write.mode("overwrite").parquet(s"$d/in")
    def chain(df: org.apache.spark.sql.DataFrame) = {
      val gated = Novelty.exactNovel(df, hist, "text")
      val masked = SpanDedup.maskWithIndex(gated, spanIdx, "text")
      Blocklist.annotate(masked, "doc_id", "text", Seq("forbidden"))
    }
    val schema = spark.read.parquet(s"$d/in").schema
    val q = chain(spark.readStream.schema(schema).parquet(s"$d/in"))
      .writeStream.format("memory").queryName("curate_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("curate_stream").collect().map(_.toSeq).toSet
    val want = chain(spark.read.parquet(s"$d/in"))
      .collect().map(_.toSeq).toSet
    assert(got === want)
    assert(got.size === 3) // doc 10 gated; 20/21 masked; 22 flagged
  }

  test("band index save/load round-trip gates identically") {
    val idx = Novelty.fitBandIndex(corpus, "text",
      shingleSize = 2, numHashes = 12, bands = 6, fpp = 1e-9)
    val d = java.nio.file.Files.createTempDirectory("bandidx").toString
    Novelty.saveBandIndex(spark, idx, d)
    val loaded = Novelty.loadBandIndex(spark, d)
    assert(loaded.shingleSize === 2 && loaded.numHashes === 12 &&
      loaded.bands === 6)
    val fromLoaded = Novelty.nearNovel(incoming, loaded, "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    val fromFit = Novelty.nearNovel(incoming, idx, "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(fromLoaded === fromFit)
  }

  test("streamed exact novelty (stream-static left_anti) equals batch") {
    val d = java.nio.file.Files.createTempDirectory("novelty").toString
    incoming.write.mode("overwrite").parquet(s"$d/in")
    val streamed = Novelty.streamExactNovel(spark, s"$d/in", corpus, "text")
    assert(streamed.isStreaming)
    val q = streamed.select("doc_id")
      .writeStream.format("memory").queryName("novel_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("novel_stream").as[Long].collect().sorted.toSeq
    val batch = Novelty.exactNovel(spark.read.parquet(s"$d/in"), corpus, "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(got === batch)
    assert(got === Seq(11L, 12L))
  }
}
