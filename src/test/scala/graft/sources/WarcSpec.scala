package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** WARC/WET container format: distributed writer, splittable reader
  * (delimiter records + Content-Length byte cut), strict per-file
  * byte-walk reader, and the honest-ingest contracts of both. */
class WarcSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private def tmpDir(): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("graft_warc_")

  private def rm(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
      .foreach(f => java.nio.file.Files.deleteIfExists(f))
  }

  test("writeWet -> readWet round-trip: multibyte octets, CRLF payloads") {
    val t = tmpDir()
    try {
      val docs = Seq(
        ("https://a.example/1", "plain ascii"),
        ("https://a.example/2", "snowman ☃ costs 4 é-bytes"),
        ("https://a.example/3", "has\r\ninternal\r\n\r\nblank lines"))
        .toDF("url", "payload")
      Warc.writeWet(docs, "url", "payload", t.resolve("wet").toString)
      val back = Warc.readWet(spark, t.resolve("wet").toString)
      assert(back.where(!col("is_valid")).isEmpty)
      val rows = back.orderBy("url").collect()
      assert(rows.length === 3)
      val r2 = rows(1)
      assert(r2.getAs[String]("payload") === "snowman ☃ costs 4 é-bytes")
      // Content-Length counts UTF-8 OCTETS, not chars (snowman is 3)
      assert(r2.getAs[Long]("content_length") ===
        "snowman ☃ costs 4 é-bytes"
          .getBytes(java.nio.charset.StandardCharsets.UTF_8).length)
      // CRLF and even a blank line INSIDE a payload survive (the cut
      // is by Content-Length, not by delimiter search)
      assert(rows(2).getAs[String]("payload") ===
        "has\r\ninternal\r\n\r\nblank lines")
      assert(rows(0).getAs[String]("record_id").startsWith("<urn:md5:"))
      assert(rows(0).getAs[String]("content_type") === "text/plain")
    } finally rm(t)
  }

  test("multi-part writes: every part file independently parseable, both readers") {
    val t = tmpDir()
    try {
      val docs = (0 until 40)
        .map(i => (s"https://m.example/$i", s"payload number $i"))
        .toDF("url", "payload")
      Warc.writeWet(docs.repartition(4), "url", "payload",
        t.resolve("wet").toString)
      val parts = new java.io.File(t.resolve("wet").toString)
        .listFiles().count(_.getName.startsWith("part-"))
      assert(parts === 4)
      val a = Warc.readWet(spark, t.resolve("wet").toString)
        .where(col("is_valid")).select("url", "payload")
      val b = Warc.readWarcFiles(spark, t.resolve("wet").toString)
        .select("url", "payload")
      assert(a.count() === 40 && b.count() === 40)
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    } finally rm(t)
  }

  test("splittable reader is honest about malformed records (is_valid)") {
    val t = tmpDir()
    try {
      val good = "WARC/1.0\r\nWARC-Target-URI: u1\r\nContent-Length: 2\r\n\r\nok\r\n\r\n"
      val noLen = "WARC/1.0\r\nWARC-Target-URI: u2\r\n\r\noops\r\n\r\n"
      java.nio.file.Files.write(t.resolve("mixed.wet"),
        (good + noLen).getBytes("UTF-8"))
      val back = Warc.readWet(spark, t.resolve("mixed.wet").toString)
      assert(back.where(col("is_valid")).count() === 1)
      assert(back.where(!col("is_valid")).count() === 1)
      // strict reader refuses the same file LOUDLY instead
      val e = intercept[org.apache.spark.SparkException] {
        Warc.readWarcFiles(spark, t.resolve("mixed.wet").toString).count()
      }
      assert(e.getMessage.contains("unparseable") ||
        String.valueOf(e.getCause).contains("unparseable"))
    } finally rm(t)
  }

  test("strict reader survives a payload embedding the record header") {
    val t = tmpDir()
    try {
      val evil = "see WARC/1.0\r\nnested header text"
      val bytes = evil.getBytes("UTF-8")
      val rec = s"WARC/1.0\r\nWARC-Target-URI: evil\r\nContent-Length: ${bytes.length}\r\n\r\n$evil\r\n\r\n" +
        "WARC/1.0\r\nWARC-Target-URI: next\r\nContent-Length: 4\r\n\r\nlast\r\n\r\n"
      java.nio.file.Files.write(t.resolve("evil.wet"), rec.getBytes("UTF-8"))
      val rows = Warc.readWarcFiles(spark, t.resolve("evil.wet").toString)
        .orderBy("url").collect()
      assert(rows.length === 2)
      assert(rows(0).getAs[String]("payload") === evil) // byte walk, not split
      assert(rows(1).getAs[String]("payload") === "last")
      // the delimiter-split path mis-parses this shape by construction
      // (documented caveat): it must NOT silently return a wrong
      // payload as valid — the fragment fails the Content-Length check
      val wet = Warc.readWet(spark, t.resolve("evil.wet").toString)
      assert(wet.where(col("is_valid") &&
        col("url") === "evil").isEmpty)
    } finally rm(t)
  }

  test("gzipped WARC: one member per record (the crawl layout) inflates whole") {
    val t = tmpDir()
    try {
      // two records, each its own gzip member, concatenated — exactly
      // how .wet.gz shards are laid out for external-index seeking
      def member(rec: String): Array[Byte] = {
        val bo = new java.io.ByteArrayOutputStream()
        val gz = new java.util.zip.GZIPOutputStream(bo)
        gz.write(rec.getBytes("UTF-8")); gz.close()
        bo.toByteArray
      }
      val r1 = "WARC/1.0\r\nWARC-Target-URI: g1\r\nContent-Length: 5\r\n\r\nhello\r\n\r\n"
      val r2 = "WARC/1.0\r\nWARC-Target-URI: g2\r\nContent-Length: 5\r\n\r\nworld\r\n\r\n"
      java.nio.file.Files.write(t.resolve("two.wet.gz"),
        member(r1) ++ member(r2))
      val rows = Warc.readWarcFiles(spark, t.resolve("two.wet.gz").toString)
        .orderBy("url").collect()
      assert(rows.map(_.getAs[String]("url")).toSeq === Seq("g1", "g2"))
      assert(rows.map(_.getAs[String]("payload")).toSeq ===
        Seq("hello", "world"))
      // plain files still pass through (magic sniff, not extension)
      assert(Warc.gunzipAll("WARC/1.0".getBytes).toSeq ===
        "WARC/1.0".getBytes.toSeq)
    } finally rm(t)
  }

  test("writeWetGz: one gzip member per record, full crawl round trip") {
    val t = tmpDir()
    try {
      val docs = (0 until 12)
        .map(i => (s"https://gz.example/$i", s"gz payload $i with ünïcode"))
        .toDF("url", "payload")
      Warc.writeWetGz(docs.repartition(3), "url", "payload",
        t.resolve("gz").toString)
      val parts = new java.io.File(t.resolve("gz").toString)
        .listFiles().filter(_.getName.endsWith(".wet.gz"))
      assert(parts.length === 3)
      // member-per-record: each part holds exactly its record count of
      // gzip headers (deterministic fixture; magic = 1f 8b 08)
      val memberCounts = parts.map { f =>
        val b = java.nio.file.Files.readAllBytes(f.toPath)
        b.indices.count(i => i + 2 < b.length &&
          (b(i) & 0xFF) == 0x1F && (b(i + 1) & 0xFF) == 0x8B && b(i + 2) == 8)
      }
      assert(memberCounts.sum === 12)
      assert(memberCounts.forall(_ === 4)) // repartition round-robins evenly
      // the strict reader inflates and recovers every record exactly
      val back = Warc.readWarcFiles(spark, t.resolve("gz").toString)
        .select("url", "payload")
      assert(back.count() === 12)
      val plain = docs.select(col("url"), col("payload"))
      assert(back.exceptAll(plain).isEmpty && plain.exceptAll(back).isEmpty)
    } finally rm(t)
  }

  test("parse kernels: header fields, truncation, byte accounting") {
    val (wt, u, rid, d, ct, cl) = Warc.parseHeaders(
      "WARC-Type: conversion\r\n" +
        "WARC-Target-URI: http://x\r\nWARC-Date: 2026-01-01T00:00:00Z\r\n" +
        "WARC-Record-ID: <urn:md5:abc>\r\nContent-Type: text/plain\r\n" +
        "Content-Length: 11")
    assert((wt, u, rid, d, ct, cl) ===
      (("conversion", "http://x", "<urn:md5:abc>", "2026-01-01T00:00:00Z",
        "text/plain", 11L)))
    assert(Warc.parseHeaders("Content-Length: NaN")._6 === -1L)
    // truncated payload rejects rather than returning a short record
    assert(Warc.parseRecordBody(
      "WARC-Target-URI: u\r\nContent-Length: 99\r\n\r\nshort") === None)
    val (recs, bad) = Warc.parseWarcBytes(
      "WARC/1.0\r\nContent-Length: 2\r\n\r\nhi\r\n\r\ngarbage tail".getBytes("UTF-8"))
    assert(recs.length === 1 && bad > 0)
    // bare-LF line endings (real crawls mix them): same record, zero
    // unaccounted bytes — the scaladoc's CRLF-or-LF claim is earned
    val (lfRecs, lfBad) = Warc.parseWarcBytes(
      ("WARC/1.0\nWARC-Target-URI: http://lf\nContent-Length: 5\n\n" +
        "hello\n\n").getBytes("UTF-8"))
    assert(lfBad === 0L)
    assert(lfRecs === Vector(("http://lf", "", "", "", 5L, "hello")))
    // mixed endings: CRLF header lines, bare-LF blank-line separator
    val (mxRecs, mxBad) = Warc.parseWarcBytes(
      ("WARC/1.0\r\nWARC-Target-URI: http://mx\r\nContent-Length: 2\r\n\n" +
        "ok\r\n\r\n").getBytes("UTF-8"))
    assert(mxBad === 0L)
    assert(mxRecs.head._1 === "http://mx" && mxRecs.head._6 === "ok")
  }

  test("parseHttpMessage: status-line variants, line endings, chunked") {
    // reason phrase present, absent, HTTP/1.0 — only the code matters
    assert(Warc.parseHttpMessage(
      "HTTP/1.1 404 Not Found\r\nContent-Type: text/plain\r\n\r\ngone")
      === Some((404, "text/plain", "gone")))
    assert(Warc.parseHttpMessage("HTTP/1.1 204\r\n\r\n") === Some((204, "", "")))
    assert(Warc.parseHttpMessage(
      "HTTP/1.0 301 Moved Permanently\r\nLocation: /x\r\n\r\n")
      === Some((301, "", "")))
    // bare-LF header endings (real crawls mix them)
    assert(Warc.parseHttpMessage(
      "HTTP/1.1 200 OK\nContent-Type: text/html\n\n<p>hi</p>")
      === Some((200, "text/html", "<p>hi</p>")))
    // not an HTTP message at all
    assert(Warc.parseHttpMessage("just some text\r\n\r\nbody") === None)
    assert(Warc.parseHttpMessage("no blank line here") === None)
    // chunked transfer de-chunks by OCTET counts (snowman is 3 bytes)
    assert(Warc.parseHttpMessage(
      "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
        "5\r\nhello\r\n7\r\n wor☃\r\n0\r\n\r\n")
      === Some((200, "", "hello wor☃")))
    // malformed chunk framing keeps the raw body (never invents bytes)
    assert(Warc.parseHttpMessage(
      "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\nZZ\r\nx")
      === Some((200, "", "ZZ\r\nx")))
    // chunk extensions after ';' are ignored per the spec
    assert(Warc.dechunk("3;ext=1\r\nabc\r\n0\r\n\r\n") === Some("abc"))
  }

  test("raw WARC responses: type dispatch, HTTP split, FormatIO route") {
    val t = tmpDir()
    try {
      val dir = t.resolve("crawl.warc").toString
      // a mixed container: response records (the payload is a full
      // HTTP message) plus request records the reader must pass
      // through with null HTTP columns
      val mixed = Seq(
        ("response", "https://r.example/1", "application/http;msgtype=response",
          Warc.httpResponseMessage(lit(200), lit("text/html"),
            lit("<html><body>Hello ☃</body></html>"))),
        ("response", "https://r.example/2", "application/http;msgtype=response",
          Warc.httpResponseMessage(lit(404), lit("text/plain"), lit("gone"))),
        ("request", "https://r.example/1", "application/http;msgtype=request",
          lit("GET /1 HTTP/1.1\r\nHost: r.example\r\n\r\n")))
      val rows = mixed.map { case (wt, u, ct, payloadCol) =>
        Seq((wt, u, ct)).toDF("wt", "url", "ct")
          .select(col("wt"), col("url"), col("ct"), payloadCol.as("payload"))
      }.reduce(_.unionByName(_))
      Warc.writeWarc(rows, "wt", "url", "ct", "payload", dir)
      val recs = Warc.readWarcRecords(spark, dir)
      assert(recs.count() === 3)
      val resp = Warc.readWarcResponses(spark, dir)
        .orderBy("url").collect()
      assert(resp.length === 2)
      assert(resp(0).getAs[Int]("http_status") === 200)
      assert(resp(0).getAs[String]("http_content_type") === "text/html")
      assert(resp(0).getAs[String]("payload") ===
        "<html><body>Hello ☃</body></html>")
      assert(resp(1).getAs[Int]("http_status") === 404)
      // the request record survives with its raw payload, null status
      val req = recs.where(col("warc_type") === "request").collect()
      assert(req.length === 1)
      assert(req(0).isNullAt(req(0).fieldIndex("http_status")))
      assert(req(0).getAs[String]("payload").startsWith("GET /1 HTTP/1.1"))
      // FormatIO: the warc filetype and .warc extension route to the
      // response view; the warc sink round-trips response frames
      val (byType, tag) = FormatIO.load("warc", dir, spark).get
      assert(tag === "warc" && byType.count() === 2)
      val byExt = FormatIO.loadFromPath(dir, spark).get._1
      assert(byExt.count() === 2)
      val dir2 = t.resolve("rt.warc").toString
      FormatIO.save("warc", byType, dir2, overwrite = true)
      val rt = Warc.readWarcResponses(spark, dir2)
        .select("url", "http_status", "http_content_type", "payload")
      assert(rt.exceptAll(byType.select("url", "http_status",
        "http_content_type", "payload")).isEmpty)
      assert(rt.count() === 2)
    } finally rm(t)
  }

  test("raw WARC streams: delimiter split ≡ strict walk ≡ micro-batches") {
    val t = tmpDir()
    try {
      val dir = t.resolve("crawl").toString
      val docs = (0 until 24).map { i =>
        (s"https://s.example/$i", 200 + (i % 2) * 204, "text/html",
          s"<p>body $i ☃</p>")
      }.toDF("url", "status", "ctype", "body")
      Warc.writeWarcResponses(docs.repartition(3), "url", "status",
        "ctype", "body", dir)
      val strict = Warc.readWarcResponses(spark, dir)
        .select("url", "http_status", "http_content_type", "payload")
      // the splittable delimiter form recovers the same typed rows
      val split = Warc.readWarcDelimited(spark, dir)
      assert(split.where(!col("is_valid")).isEmpty)
      val splitResp = split
        .where(col("http_status").isNotNull)
        .select("url", "http_status", "http_content_type", "payload")
      assert(splitResp.exceptAll(strict).isEmpty &&
        strict.exceptAll(splitResp).isEmpty)
      assert(strict.count() === 24)
      // and the streaming form drains the same rows shard by shard
      val q = Warc.streamWarcRecords(spark, dir + "/part-*")
        .writeStream.format("memory").queryName("warc_stream")
        .option("checkpointLocation", t.resolve("ck").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      val streamed = spark.table("warc_stream")
        .where(col("is_valid") && col("http_status").isNotNull)
        .select("url", "http_status", "http_content_type", "payload")
      assert(streamed.exceptAll(strict).isEmpty &&
        strict.exceptAll(streamed).isEmpty)
    } finally {
      spark.streams.active.foreach(_.stop())
      rm(t)
    }
  }

  test("quarantine reader: corrupt shard accounted, not fatal") {
    val t = tmpDir()
    try {
      val dir = t.resolve("mixed")
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.write(dir.resolve("good.warc"),
        ("WARC/1.0\r\nWARC-Target-URI: http://g\r\nContent-Length: 4\r\n" +
          "\r\ngood\r\n\r\n").getBytes("UTF-8"))
      java.nio.file.Files.write(dir.resolve("bad.warc"),
        ("WARC/1.0\r\nWARC-Target-URI: http://b\r\nContent-Length: 3\r\n" +
          "\r\nyes\r\n\r\nnot a record at all").getBytes("UTF-8"))
      // the strict reader aborts the job on the corrupt shard...
      intercept[org.apache.spark.SparkException] {
        Warc.readWarcFiles(spark, dir.toString).collect()
      }
      // ...the quarantine reader lands every parseable record plus an
      // accounting row for the corrupt file
      val q = Warc.readWarcFilesQuarantine(spark, dir.toString).collect()
      val valid = q.filter(_.getAs[Boolean]("is_valid"))
      val quarantined = q.filter(!_.getAs[Boolean]("is_valid"))
      assert(valid.map(_.getAs[String]("url")).sorted.toSeq ===
        Seq("http://b", "http://g"))
      assert(valid.filter(_.getAs[String]("url") == "http://g")
        .forall(_.getAs[Long]("bad_bytes") == 0L))
      assert(valid.filter(_.getAs[String]("url") == "http://b")
        .forall(_.getAs[Long]("bad_bytes") > 0L))
      assert(quarantined.length === 1)
      assert(quarantined.head.getAs[String]("file").endsWith("bad.warc"))
      assert(quarantined.head.getAs[Long]("bad_bytes") > 0L)
    } finally rm(t)
  }

  test("wet sink honors the overwrite flag (no silent clobber)") {
    val t = tmpDir()
    try {
      val dir = t.resolve("out.wet").toString
      val docs = Seq(("https://o.example/1", "first")).toDF("url", "payload")
      FormatIO.save("wet", docs, dir, overwrite = true)
      // overwrite=false on an existing path must ERROR like every
      // other format's sink, never silently clobber
      intercept[Exception] {
        FormatIO.save("wet", docs, dir, overwrite = false)
      }
      val more = Seq(("https://o.example/2", "second")).toDF("url", "payload")
      FormatIO.save("wet", more, dir, overwrite = true)
      val back = Warc.readWet(spark, dir).where(col("is_valid"))
      assert(back.count() === 1)
      assert(back.head().getAs[String]("url") === "https://o.example/2")
    } finally rm(t)
  }

  test("streamWet: shard-per-microbatch ingest equals the batch read") {
    val t = tmpDir()
    try {
      val docs = (0 until 30)
        .map(i => (s"https://s.example/$i", s"streamed payload $i ☃"))
        .toDF("url", "payload")
      Warc.writeWet(docs.repartition(3), "url", "payload",
        t.resolve("wet").toString)
      val q = Warc.streamWet(spark, t.resolve("wet").toString + "/part-*")
        .writeStream.format("memory").queryName("wet_stream")
        .option("checkpointLocation", t.resolve("ck").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      val streamed = spark.table("wet_stream")
        .select("url", "content_length", "payload")
      val batch = Warc.readWet(spark, t.resolve("wet").toString)
        .where(col("is_valid"))
        .select("url", "content_length", "payload")
      assert(streamed.count() === 30)
      assert(streamed.exceptAll(batch).isEmpty &&
        batch.exceptAll(streamed).isEmpty)
    } finally {
      spark.streams.active.foreach(_.stop())
      rm(t)
    }
  }

  test("FormatIO speaks wet: filetype load, extension dispatch, sink") {
    val t = tmpDir()
    try {
      val dir = t.resolve("crawl.wet").toString
      val docs = Seq(("https://f.example/1", "alpha"),
        ("https://f.example/2", "beta")).toDF("url", "payload")
      FormatIO.save("wet", docs, dir, overwrite = true)
      val (byType, tag) = FormatIO.load("wet", dir, spark).get
      assert(tag === "wet")
      assert(byType.count() === 2)
      assert(!byType.columns.contains("is_valid")) // valid-only contract
      assert(byType.columns.toSet.contains("payload"))
      // extension dispatch: a .wet path routes without a filetype
      val byExt = FormatIO.loadFromPath(dir, spark).get._1
      assert(byExt.select("url", "payload").exceptAll(
        byType.select("url", "payload")).isEmpty)
      // the sink refuses frames without the WET column contract
      intercept[IllegalArgumentException] {
        FormatIO.save("wet", docs.select(col("url")), t.resolve("x").toString)
      }
    } finally rm(t)
  }

  test("FormatIO loads .wet.gz member-per-record shards via the wet filetype") {
    val t = tmpDir()
    try {
      val dir = t.resolve("gz").toString
      val docs = (0 until 9)
        .map(i => (s"https://gz.example/$i", s"gz payload $i ☃"))
        .toDF("url", "payload")
      Warc.writeWetGz(docs.repartition(3), "url", "payload", dir)
      // the text route inflates concatenated gzip members whole
      // (Hadoop's decompressor handles multi-member streams), so the
      // splittable record split applies to the inflated bytes —
      // .wet.gz shards feed FormatIO/CurateCli with no special-casing
      val (df, tag) = FormatIO.load("wet", dir, spark).get
      assert(tag === "wet" && df.count() === 9)
      assert(df.select("url", "payload")
        .exceptAll(docs.select("url", "payload")).isEmpty)
    } finally rm(t)
  }

  test(".warc.wet.gz naming routes to the WET reader, not the response reader") {
    val t = tmpDir()
    try {
      // real CommonCrawl WET shards carry BOTH substrings in their
      // name; the response reader would silently return an empty frame
      // for them (conversion records have no HTTP message) — the
      // extension dispatch must prefer the more specific .wet
      val dir = t.resolve("CC-MAIN.warc.wet.gz").toString
      val docs = Seq(("https://cc.example/1", "conversion alpha"),
        ("https://cc.example/2", "conversion beta")).toDF("url", "payload")
      Warc.writeWetGz(docs, "url", "payload", dir)
      val (df, tag) = FormatIO.loadFromPath(dir, spark).get
      assert(tag === "wet")
      assert(df.count() === 2) // the warc route would return 0 rows
      assert(df.select("url", "payload")
        .exceptAll(docs.select("url", "payload")).isEmpty)
      // a raw crawl name (no .wet) still routes to the response reader
      val rawDir = t.resolve("CC-RAW.warc").toString
      val resp = Seq(("response", "https://cc.example/r",
        "application/http;msgtype=response")).toDF("wt", "url", "ct")
        .select(col("wt"), col("url"), col("ct"),
          Warc.httpResponseMessage(lit(200), lit("text/html"),
            lit("<p>raw</p>")).as("payload"))
      Warc.writeWarc(resp, "wt", "url", "ct", "payload", rawDir)
      val (rawDf, rawTag) = FormatIO.loadFromPath(rawDir, spark).get
      assert(rawTag === "warc" && rawDf.count() === 1)
    } finally rm(t)
  }

  test("mixed header line endings parse: \\n\\r\\n and \\r\\n\\n separators") {
    val t = tmpDir()
    try {
      val dir = t.resolve("mixed-endings")
      java.nio.file.Files.createDirectories(dir)
      // last header line LF-terminated, blank line CRLF (`...\n\r\n`) —
      // the real-crawl mix the docstring promises; and the converse
      val recA = "WARC/1.0\r\nWARC-Target-URI: http://a\nContent-Length: 5\n\r\n" +
        "alpha\r\n\r\n"
      val recB = "WARC/1.0\nWARC-Target-URI: http://b\r\nContent-Length: 4\r\n\n" +
        "beta\r\n\r\n"
      java.nio.file.Files.write(dir.resolve("mixed.warc"),
        (recA + recB).getBytes("UTF-8"))
      val recs = Warc.readWarcFiles(spark, dir.toString)
        .orderBy("url").collect()
      assert(recs.length === 2)
      assert(recs(0).getAs[String]("url") === "http://a")
      assert(recs(0).getAs[String]("payload") === "alpha")
      assert(recs(1).getAs[String]("url") === "http://b")
      assert(recs(1).getAs[String]("payload") === "beta")
    } finally rm(t)
  }

  test("LF-terminated last header + spec CRLF-CRLF blank: payload window exact") {
    // `...\n\r\n\r\n` — the earliest double-break (`\n`+`\r\n`) ends
    // one break early; the parser must consume the WHOLE separator or
    // the payload gains a leading CRLF and the Content-Length window
    // drops the last two real bytes
    val rec = "WARC/1.0\r\nWARC-Target-URI: http://c\nContent-Length: 5\n\r\n\r\n" +
      "gamma\r\n\r\n"
    val (recs, bad) = Warc.parseWarcBytes(rec.getBytes("UTF-8"))
    assert(bad === 0L)
    assert(recs.map(r => (r._1, r._6)) === Vector(("http://c", "gamma")))
    // spec-pure CRLF blank followed by a payload that itself STARTS
    // with CRLF: the separator must NOT swallow the payload's break
    val lead = "WARC/1.0\r\nWARC-Target-URI: http://d\r\nContent-Length: 7\r\n\r\n" +
      "\r\ndelta\r\n\r\n"
    val (recs2, bad2) = Warc.parseWarcBytes(lead.getBytes("UTF-8"))
    assert(bad2 === 0L)
    assert(recs2.map(r => (r._1, r._6)) === Vector(("http://d", "\r\ndelta")))
    // the genuinely ambiguous mix — LF header + CRLF blank + a payload
    // starting with CRLF — disambiguates by Content-Length: only the
    // 3-byte separator's window ends on a valid record boundary here
    // (the 5-byte read would run past the payload into EOF)
    val mixLead = "WARC/1.0\r\nWARC-Target-URI: http://e\nContent-Length: 7\n\r\n" +
      "\r\ndelta"
    val (recs3, bad3) = Warc.parseWarcBytes(mixLead.getBytes("UTF-8"))
    assert(bad3 === 0L)
    assert(recs3.map(r => (r._1, r._6)) === Vector(("http://e", "\r\ndelta")))
  }

  test("reader plans stay narrow: no exchange before the payload lands") {
    val t = tmpDir()
    try {
      val docs = Seq(("https://p.example/1", "x")).toDF("url", "payload")
      Warc.writeWet(docs, "url", "payload", t.resolve("wet").toString)
      val plan = Warc.readWet(spark, t.resolve("wet").toString)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan.take(1500))
    } finally rm(t)
  }
}
