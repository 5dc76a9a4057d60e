package graft.cli

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** [[CurateCli]] — arg grammar + both lifecycles driven end to end
  * (the SentimentCliSpec pattern): batch (parse -> run ->
  * Curate.standard -> parquet corpus + CSV report, cross-checked
  * against the library call) and streaming (--stream over a staged
  * file feed with --compact-every, checkpointed availableNow drain,
  * rerun picks up only new files). */
class CurateCliSpec extends AnyFunSuite with SparkTestSession {

  test("parse: full flag surface") {
    val c = CurateCli.parse(Seq(
      "--input", "in.parquet", "--output", "out", "--report", "rep.csv",
      "--filetype", "parquet", "--id-col", "id", "--text-col", "body",
      "--group-col", "site", "--min-quality", "0.4",
      "--max-dup2gram", "0.2", "--near-threshold", "0.8",
      "--benchmark", "b.parquet", "--historical", "h.parquet",
      "--max-avg-neg-logp", "9.5", "--semantic-col", "emb",
      "--semantic-threshold", "0.97", "--keep-best",
      "--stream", "--compact-every", "4")).get
    assert(c.input === "in.parquet" && c.output === "out")
    assert(c.report === Some("rep.csv") && c.fileType === Some("parquet"))
    assert(c.idCol === "id" && c.textCol === "body" && c.groupCol === "site")
    assert(c.minQuality === 0.4 && c.maxDup2gram === 0.2)
    assert(c.nearThreshold === 0.8)
    assert(c.benchmark === Some("b.parquet"))
    assert(c.historical === Some("h.parquet"))
    assert(c.maxAvgNegLogp === Some(9.5))
    assert(c.semanticCol === Some("emb") && c.semanticThreshold === 0.97)
    assert(c.keepBest && c.stream && c.compactEvery === Some(4))
  }

  test("parse: input+output required; bad values rejected") {
    assert(CurateCli.parse(Seq("--input", "a")).isEmpty)
    assert(CurateCli.parse(Seq("--output", "b")).isEmpty)
    assert(CurateCli.parse(Seq("--input", "a", "--output", "b")).isDefined)
    assert(CurateCli.parse(Seq("--input", "a", "--output", "b",
      "--min-quality", "abc")).isEmpty)
    assert(CurateCli.parse(Seq("--input", "a", "--output", "b",
      "--compact-every", "0")).isEmpty)
    assert(CurateCli.parse(Seq("--input", "a", "--output", "b",
      "--help")).isEmpty)
    assert(CurateCli.parse(Seq("--input", "a", "--output", "b",
      "--bogus", "x")).isEmpty)
  }

  test("batch lifecycle: parquet corpus + CSV report equal the library run") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text", "source")
    val tmp = java.nio.file.Files.createTempDirectory("graft-curatecli")
    val in = tmp.resolve("in.parquet").toString
    val bench = tmp.resolve("bench.parquet").toString
    val out = tmp.resolve("curated").toString
    val rep = tmp.resolve("report.csv").toString
    docs.write.parquet(in)
    docs.filter(col("doc_id") % 101 === 0).write.parquet(bench)
    CurateCli.run(CurateCli.parse(Seq(
      "--input", in, "--output", out, "--report", rep,
      "--filetype", "parquet", "--benchmark", bench)).get, spark)
    // the curated corpus equals the direct library call
    val (libOut, libReport) = graft.ops.Curate.standard(
      spark.read.parquet(in), spark.read.parquet(bench))
    val libIds = libOut.select("doc_id").collect().map(_.getLong(0)).toSet
    libOut.unpersist()
    val cliIds = spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(cliIds === libIds)
    assert(cliIds.nonEmpty)
    // split column landed (the final stage's annotation)
    assert(spark.read.parquet(out).columns.contains("split"))
    // the CSV report carries the same stage rows as the library report
    val repRows = spark.read.option("header", "true").csv(rep)
      .select(col("stage"), col("n_rows").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(repRows === libReport.stages)
    assert(repRows.map(_._1) === Seq("quality", "repetition", "exact_dedup",
      "near_dedup", "decontaminate", "split"))
  }

  test("batch lifecycle over a blob corpus: --blob-col adds the perceptual stage") {
    import spark.implicits._
    // documents carrying a synthetic image payload keyed doc_id % 7:
    // docs sharing a key carry byte-identical blobs -> perceptual
    // clusters; --keep-best keeps the highest-quality copy per cluster
    val gen = udf((id: Long) => {
      val w = 36; val h = 24
      val rgb = Array.tabulate(w * h * 3) { i =>
        ((id * 31 + i * 7) % 256).toByte
      }
      graft.ops.Multimodal.encodePpm(w, h, rgb)
    })
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text", "source")
      .withColumn("blob", gen(col("doc_id") % 7))
    val tmp = java.nio.file.Files.createTempDirectory("graft-curateblob")
    val in = tmp.resolve("in.parquet").toString
    val out = tmp.resolve("curated").toString
    val rep = tmp.resolve("report.csv").toString
    docs.write.parquet(in)
    CurateCli.run(CurateCli.parse(Seq(
      "--input", in, "--output", out, "--report", rep,
      "--filetype", "parquet", "--blob-col", "blob",
      "--blob-max-hamming", "0", "--keep-best")).get, spark)
    // the report carries the perceptual stage between the LM-side
    // gates and the text dedups, and the CLI equals the library
    val repRows = spark.read.option("header", "true").csv(rep)
      .select(col("stage"), col("n_rows").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(repRows.map(_._1) === Seq("quality", "repetition",
      "perceptual_dedup", "exact_dedup", "near_dedup", "decontaminate",
      "split"))
    val (libOut, libReport) = graft.ops.Curate.standard(
      spark.read.parquet(in), spark.read.parquet(in).limit(0),
      blobCol = Some("blob"), blobMaxHamming = 0,
      keepBestByQuality = true)
    val libIds = libOut.select("doc_id").collect().map(_.getLong(0)).toSet
    libOut.unpersist()
    assert(repRows === libReport.stages)
    val cliIds = spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(cliIds === libIds)
    // the perceptual stage actually BITES: at most one survivor per
    // blob key among the gate survivors
    val perceptual = repRows.toMap.apply("perceptual_dedup")
    assert(perceptual <= 7L)
    assert(repRows.toMap.apply("repetition") > perceptual)
    // bad flag value rejected; blob flags parse
    assert(CurateCli.parse(Seq("--input", "a", "--output", "b",
      "--blob-max-hamming", "-1")).isEmpty)
    assert(CurateCli.parse(Seq("--input", "a", "--output", "b",
      "--blob-col", "blob", "--blob-max-hamming", "3")).exists(c =>
      c.blobCol === Some("blob") && c.blobMaxHamming === 3))
  }

  test("batch lifecycle ingests WET crawl shards directly (--filetype wet)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(concat(lit("https://c.example/doc/"), col("doc_id")).as("url"),
        col("text").as("payload"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-curatewet")
    val crawl = tmp.resolve("crawl").toString
    val out = tmp.resolve("curated").toString
    graft.sources.Warc.writeWet(docs.repartition(2), "url", "payload", crawl)
    // a crawl frame has no `source`: split groups fall to the url
    // itself (doc-level splits) via the existing --group-col flag
    CurateCli.run(CurateCli.parse(Seq(
      "--input", crawl, "--output", out, "--filetype", "wet",
      "--id-col", "url", "--text-col", "payload",
      "--group-col", "url")).get, spark)
    val curated = spark.read.parquet(out)
    assert(curated.count() > 0)
    assert(curated.columns.contains("url") &&
      curated.columns.contains("payload") &&
      curated.columns.contains("split"))
    // the CLI run over the crawl equals the library run over the same
    // valid-record frame — ingest format is transparent to curation
    val wet = graft.sources.FormatIO.load("wet", crawl, spark).get._1
    val (libOut, _) = graft.ops.Curate.standard(
      wet, wet.limit(0), idCol = "url", textCol = "payload",
      groupCol = "url")
    val libIds = libOut.select("url").collect().map(_.getString(0)).toSet
    libOut.unpersist()
    val cliIds = curated.select("url").collect().map(_.getString(0)).toSet
    assert(cliIds === libIds)
  }

  test("batch lifecycle ingests RAW WARC response records (--filetype warc)") {
    // response records with text/plain bodies: the reader strips the
    // HTTP message, so curation sees exactly the document text
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(concat(lit("https://w.example/doc/"), col("doc_id")).as("url"),
        lit(200).as("status"), lit("text/plain").as("ctype"),
        col("text").as("body"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-curatewarc")
    val crawl = tmp.resolve("crawl").toString
    val out = tmp.resolve("curated").toString
    graft.sources.Warc.writeWarcResponses(docs.repartition(2),
      "url", "status", "ctype", "body", crawl)
    CurateCli.run(CurateCli.parse(Seq(
      "--input", crawl, "--output", out, "--filetype", "warc",
      "--id-col", "url", "--text-col", "payload",
      "--group-col", "url")).get, spark)
    val curated = spark.read.parquet(out)
    assert(curated.count() > 0)
    assert(curated.columns.contains("url") &&
      curated.columns.contains("payload") &&
      curated.columns.contains("split"))
    // CLI over the raw crawl ≡ library over the parsed response view
    val warc = graft.sources.FormatIO.load("warc", crawl, spark).get._1
    val (libOut, _) = graft.ops.Curate.standard(
      warc, warc.limit(0), idCol = "url", textCol = "payload",
      groupCol = "url")
    val libIds = libOut.select("url").collect().map(_.getString(0)).toSet
    libOut.unpersist()
    val cliIds = curated.select("url").collect().map(_.getString(0)).toSet
    assert(cliIds === libIds)
  }

  test("stream lifecycle over WET crawl shards (--stream --filetype wet)") {
    import spark.implicits._
    val proseA = "the quick brown fox jumps over the lazy dog and then " +
      "discusses the merits of deterministic testing with a friend"
    val proseB = "seventeen sailors navigate uncharted waters while " +
      "charting constellations nobody has catalogued before tonight"
    val tmp = java.nio.file.Files.createTempDirectory("graft-curatecli-w")
    val srcDir = tmp.resolve("feed").toString
    val out = tmp.resolve("curated").toString
    // two crawl drops: the second replays drop 1's first document —
    // the durable state must dedup it across micro-batch runs
    graft.sources.Warc.writeWet(
      Seq(("https://s.example/a", proseA), ("https://s.example/b", proseB))
        .toDF("url", "payload"),
      "url", "payload", s"$srcDir/drop0")
    def cli() = CurateCli.run(CurateCli.parse(Seq(
      "--input", s"$srcDir/*/part-*", "--output", out,
      "--filetype", "wet", "--id-col", "url", "--text-col", "payload",
      "--min-quality", "0.0", "--max-dup2gram", "1.0",
      "--stream")).get, spark)
    cli()
    assert(spark.read.parquet(out).select("url")
      .collect().map(_.getString(0)).toSet ===
      Set("https://s.example/a", "https://s.example/b"))
    graft.sources.Warc.writeWet(
      Seq(("https://s.example/c", proseA)).toDF("url", "payload"),
      "url", "payload", s"$srcDir/drop1")
    cli()
    // the replayed text is an exact cross-run duplicate: dropped
    assert(spark.read.parquet(out).select("url")
      .collect().map(_.getString(0)).toSet ===
      Set("https://s.example/a", "https://s.example/b"),
      "cross-run dedup over the WET stream broken")
  }

  test("stream lifecycle: --stream drains a file feed through the stateful " +
      "tail with auto-compaction; rerun ingests only new files") {
    import spark.implicits._
    val proseA = "the quick brown fox jumps over the lazy dog and then " +
      "discusses the merits of deterministic testing with a friend"
    val proseB = "seventeen sailors navigate uncharted waters while " +
      "charting constellations nobody has catalogued before tonight"
    val proseC = "a completely different essay concerning the economics " +
      "of medieval grain markets and their seasonal price cycles"
    val tmp = java.nio.file.Files.createTempDirectory("graft-curatecli-s")
    val srcDir = tmp.resolve("feed").toString
    val out = tmp.resolve("curated").toString
    def stage(name: String, rows: Seq[(Long, String, String)],
              mtime: Long): Unit = {
      rows.toDF("doc_id", "source", "text").coalesce(1)
        .write.parquet(s"$srcDir/$name")
      java.nio.file.Files.walk(java.nio.file.Paths.get(srcDir, name))
        .forEach(p => java.nio.file.Files.setLastModifiedTime(p,
          java.nio.file.attribute.FileTime.fromMillis(mtime)))
    }
    stage("f0.parquet", Seq((1L, "s", proseA), (2L, "s", proseB)), 1000000L)
    stage("f1.parquet", Seq((11L, "s", proseC)), 1060000L)
    def cli() = CurateCli.run(CurateCli.parse(Seq(
      "--input", s"$srcDir/*.parquet", "--output", out,
      "--min-quality", "0.0", "--max-dup2gram", "1.0",
      "--stream", "--compact-every", "1",
      "--max-files-per-trigger", "1")).get, spark)
    cli()
    assert(spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).toSet === Set(1L, 2L, 11L))
    // auto-compaction ran: the manifest committed beside the state
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(
      out + "__state", "_compaction.meta")))
    // rerun with one NEW file: the checkpoint skips the drained ones,
    // and the durable state drops the cross-run exact + near dups
    stage("f2.parquet", Seq((21L, "s", proseA),
      (22L, "s", proseC + " indeed")), 1120000L)
    cli()
    assert(spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).toSet === Set(1L, 2L, 11L),
      "cross-run dedup through the durable state broken")
  }

  test("stream lifecycle over a blob corpus: --stream --blob-col runs the " +
      "durable perceptual tail") {
    import spark.implicits._
    def img(k: Int): Array[Byte] = {
      val w = 36; val h = 24
      val a = new Array[Byte](w * h * 3)
      for (y <- 0 until h; x <- 0 until w) {
        val i = 3 * (y * w + x)
        a(i) = ((k * 47 + x * 11 + y * 5) % 256).toByte
        a(i + 1) = ((k * 29 + x * 3) % 256).toByte
        a(i + 2) = ((k * 13 + y * 7) % 256).toByte
      }
      a
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft-curatecli-b")
    val srcDir = tmp.resolve("feed").toString
    val out = tmp.resolve("curated").toString
    def stage(name: String, rows: Seq[(Long, String, String, Array[Byte])],
              mtime: Long): Unit = {
      rows.toDF("doc_id", "source", "text", "blob").coalesce(1)
        .write.parquet(s"$srcDir/$name")
      java.nio.file.Files.walk(java.nio.file.Paths.get(srcDir, name))
        .forEach(p => java.nio.file.Files.setLastModifiedTime(p,
          java.nio.file.attribute.FileTime.fromMillis(mtime)))
    }
    stage("f0.parquet", Seq(
      (1L, "s", "wholly unique text one",
        graft.ops.Multimodal.encodePpm(36, 24, img(0))),
      (2L, "s", "wholly unique text two",
        graft.ops.Multimodal.encodePpm(36, 24, img(5)))), 1000000L)
    // the second micro-batch carries a CROSS-CODEC perceptual dup of
    // doc 1 (unique text — only the signature state can drop it)
    stage("f1.parquet", Seq(
      (11L, "s", "wholly unique text three",
        graft.ops.Multimodal.encodePng(36, 24, img(0))),
      (12L, "s", "wholly unique text four",
        graft.ops.Multimodal.encodePpm(36, 24, img(9)))), 1060000L)
    CurateCli.run(CurateCli.parse(Seq(
      "--input", s"$srcDir/*.parquet", "--output", out,
      "--min-quality", "0.0", "--max-dup2gram", "1.0",
      "--near-threshold", "1.01",
      "--blob-col", "blob", "--blob-max-hamming", "0",
      "--stream", "--max-files-per-trigger", "1")).get, spark)
    assert(spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).toSet === Set(1L, 2L, 12L),
      "--blob-col was not honored by the streaming tail")
    // the signature state landed beside the output
    assert(spark.read.parquet(out + "__state/percsigs").select("__id")
      .collect().map(_.getLong(0)).toSet === Set(1L, 2L, 12L))
  }

  test("stream lifecycle over an embedding corpus: --stream --semantic-col " +
      "runs the durable semantic tail") {
    import spark.implicits._
    def oneHot(k: Int): Array[Float] =
      Array.tabulate(8)(i => if (i == k) 1.0f else 0.0f)
    val tmp = java.nio.file.Files.createTempDirectory("graft-curatecli-v")
    val srcDir = tmp.resolve("feed").toString
    val out = tmp.resolve("curated").toString
    def stage(name: String, rows: Seq[(Long, String, String, Array[Float])],
              mtime: Long): Unit = {
      rows.toDF("doc_id", "source", "text", "vec").coalesce(1)
        .write.parquet(s"$srcDir/$name")
      java.nio.file.Files.walk(java.nio.file.Paths.get(srcDir, name))
        .forEach(p => java.nio.file.Files.setLastModifiedTime(p,
          java.nio.file.attribute.FileTime.fromMillis(mtime)))
    }
    stage("f0.parquet", Seq(
      (1L, "s", "wholly unique text one", oneHot(0)),
      (2L, "s", "wholly unique text two", oneHot(1))), 1000000L)
    // the second micro-batch carries an identical-vector dup of doc 1
    // (unique text — only the semantic state can drop it)
    stage("f1.parquet", Seq(
      (11L, "s", "wholly unique text three", oneHot(0)),
      (12L, "s", "wholly unique text four", oneHot(2))), 1060000L)
    CurateCli.run(CurateCli.parse(Seq(
      "--input", s"$srcDir/*.parquet", "--output", out,
      "--min-quality", "0.0", "--max-dup2gram", "1.0",
      "--near-threshold", "1.01",
      "--semantic-col", "vec",
      "--stream", "--max-files-per-trigger", "1")).get, spark)
    assert(spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).toSet === Set(1L, 2L, 12L),
      "--semantic-col was not honored by the streaming tail")
    assert(spark.read.parquet(out + "__state/semvecs").select("__id")
      .collect().map(_.getLong(0)).toSet === Set(1L, 2L, 12L))
  }
}
