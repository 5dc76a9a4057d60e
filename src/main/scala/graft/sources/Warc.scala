package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * WARC/WET — the web-crawl container format (ISO 28500), the shape
 * web-scale LLM corpora actually arrive in (CommonCrawl WET files are
 * WARC `conversion` records holding extracted text). Extension
 * surface (no reference counterpart).
 *
 * Two REAL read paths, both returning the same schema
 * (url, record_id, warc_date, content_type, content_length, payload):
 *
 *  - [[readWet]] — the SPLITTABLE path: `spark.read.text` with the
 *    record header `"WARC/1.0\r\n"` as the line separator, so Hadoop's
 *    delimiter scan assigns record boundaries inside ONE file to many
 *    tasks — the layout for TB-scale uncompressed WET shards. Payload
 *    is cut to exactly `Content-Length` BYTES (UTF-8), so CRLF inside
 *    a payload is fine; the one structural caveat (shared by every
 *    delimiter-split reader) is a payload containing the literal
 *    record header itself, which the strict path below handles.
 *  - [[readWarcFiles]] — the STRICT per-file path: `binaryFile` rows
 *    parsed with exact byte arithmetic ([[parseWarcBytes]] walks
 *    records by Content-Length, never by delimiter search), immune to
 *    payloads embedding record headers. One task per file — exactly
 *    the production parallelism for `.warc.gz`, which is not
 *    splittable anyway (gzip members); parallelism comes from the
 *    many-shards layout crawls always have.
 *
 * [[writeWet]] is the distributed fixture/sink side: one record
 * string per row, text sink with CRLF line separator — the writer's
 * per-row `lineSep` terminator is exactly the record's trailing
 * blank line, so concatenated rows form a valid WET file and every
 * part file is independently parseable (both readers accept globs).
 *
 * RAW crawl output (`.warc.gz` response records — WET's upstream) is
 * first-class too: [[readWarcRecords]]/[[readWarcResponses]] dispatch
 * on `WARC-Type` and split the HTTP message (status, content-type,
 * de-chunked body) out of response payloads; [[writeWarc]]/
 * [[writeWarcResponses]] are the matching writers.
 */
object Warc {

  val RecordHeader = "WARC/1.0"

  /** One WET `conversion` record as a string Column: `Content-Length`
    * is the UTF-8 OCTET length (the spec's meaning — [[readWet]] cuts
    * by it); `WARC-Record-ID` is a deterministic md5-derived URN so
    * readers and oracles can replay it. A null url/payload fails AT
    * WRITE TIME, loudly — no extra validation scan of a 100 TB input.
    * NOTE: no trailing blank line — each writer adds its own record
    * terminator. */
  private def recordColumn(urlCol: String, payloadCol: String,
                           warcDate: String): org.apache.spark.sql.Column = {
    val rec = concat(
      lit(RecordHeader), lit("\r\n"),
      lit("WARC-Type: conversion\r\n"),
      lit("WARC-Target-URI: "), col(urlCol), lit("\r\n"),
      lit("WARC-Date: "), lit(warcDate), lit("\r\n"),
      lit("WARC-Record-ID: <urn:md5:"), md5(col(urlCol).cast("binary")),
      lit(">\r\n"),
      lit("Content-Type: text/plain\r\n"),
      lit("Content-Length: "),
      octet_length(col(payloadCol)).cast("string"), lit("\r\n"),
      lit("\r\n"),
      col(payloadCol), lit("\r\n"))
    when(col(urlCol).isNull.or(col(payloadCol).isNull),
      raise_error(concat(lit("writeWet: null url or payload, url="),
        coalesce(col(urlCol), lit("NULL"))))).otherwise(rec)
  }

  /** Build WET `conversion` records from (url, payload) columns and
    * write them as plain-text part-files (see [[recordColumn]] for
    * the record contract). The per-row text-sink `lineSep` terminator
    * IS the record's trailing blank line, so concatenated rows form a
    * valid WET file and every part is independently parseable. */
  def writeWet(df: DataFrame, urlCol: String, payloadCol: String,
               path: String, warcDate: String = "2026-01-01T00:00:00Z",
               overwrite: Boolean = true): Unit =
    df.select(recordColumn(urlCol, payloadCol, warcDate).as("value"))
      .write.mode(if (overwrite) "overwrite" else "errorifexists")
      .option("lineSep", "\r\n").text(path)

  /** The `.wet.gz` writer: ONE GZIP MEMBER PER RECORD, the layout
    * crawls actually ship (it is what makes a shard seekable through
    * an external index — a reader can start inflating at any member
    * boundary). One `part-<partition>.wet.gz` file per non-empty
    * partition, written task-side (a shared Deflater per task,
    * re-initialized per member, so a million records do not allocate
    * a million native deflaters). Overwrite semantics: the target
    * directory is cleared up front; the per-task writes are not
    * committer-atomic (document, don't pretend) — rerun on failure.
    * Round trip: [[readWarcFiles]] inflates members transparently. */
  def writeWetGz(df: DataFrame, urlCol: String, payloadCol: String,
                 path: String,
                 warcDate: String = "2026-01-01T00:00:00Z"): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val target = new org.apache.hadoop.fs.Path(path)
    val driverFs = target.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    driverFs.delete(target, true)
    driverFs.mkdirs(target)
    // the DRIVER's Hadoop conf rides a broadcast to the write tasks
    // (SerializableHadoopConf) — object-store credentials and custom
    // filesystem impls work task-side, not just file:///default HDFS
    val bcConf = SerializableHadoopConf.broadcast(spark)
    df.select(concat(recordColumn(urlCol, payloadCol, warcDate),
        lit("\r\n")).as("value"))
      .as[String]
      .foreachPartition { (it: Iterator[String]) =>
        if (it.hasNext) {
          val conf = bcConf.value.value
          val dir = new org.apache.hadoop.fs.Path(path)
          val fs = dir.getFileSystem(conf)
          val tc = org.apache.spark.TaskContext.get()
          val file = new org.apache.hadoop.fs.Path(dir,
            f"part-${tc.partitionId()}%05d.wet.gz")
          val out = fs.create(file, true)
          try {
            it.foreach { rec =>
              // one gzip member per record: the GZIPOutputStream is
              // per-member (header+trailer), the native deflater is
              // released immediately via end() — close() would also
              // close the shared file stream
              val gz = new java.util.zip.GZIPOutputStream(out, 32 * 1024) {
                def endMember(): Unit = { finish(); `def`.end() }
              }
              gz.write(rec.getBytes(java.nio.charset.StandardCharsets.UTF_8))
              gz.endMember()
            }
          } finally out.close()
        }
      }
  }

  /** Parse the named headers of one record (text BETWEEN the version
    * line and the blank line): (warc_type, url, record_id, date,
    * content_type, content_length). Content-Length comes back -1 when
    * absent or malformed. Lines split on CRLF or bare LF (the spec
    * mandates CRLF; real crawls contain both). */
  private[sources] def parseHeaders(headerText: String):
      (String, String, String, String, String, Long) = {
    var wtype = ""; var url = ""; var rid = ""; var date = ""; var ctype = ""
    var clen = -1L
    headerText.split("\r\n|\n").foreach { line =>
      val k = line.indexOf(':')
      if (k > 0) {
        val key = line.substring(0, k).trim
        val v = line.substring(k + 1).trim
        key match {
          case "WARC-Type" => wtype = v
          case "WARC-Target-URI" => url = v
          case "WARC-Record-ID" => rid = v
          case "WARC-Date" => date = v
          case "Content-Type" => ctype = v
          case "Content-Length" =>
            clen = try v.toLong catch { case _: NumberFormatException => -1L }
          case _ => ()
        }
      }
    }
    (wtype, url, rid, date, ctype, clen)
  }

  /** Parse ONE record body (everything after the `WARC/1.0\r\n`
    * version line): named headers until the blank line, then the
    * payload cut to exactly Content-Length UTF-8 bytes. Returns None
    * for fragments that are not records (e.g. the empty split before
    * a file's first delimiter). */
  private[sources] def parseRecordBody(body: String):
      Option[(String, String, String, String, Long, String)] =
    parseRecordBodyTyped(body).map {
      case (_, url, rid, date, ctype, clen, payload) =>
        (url, rid, date, ctype, clen, payload)
    }

  /** [[parseRecordBody]] with the WARC-Type kept (first element) —
    * the kernel behind the typed delimiter readers. */
  private[sources] def parseRecordBodyTyped(body: String):
      Option[(String, String, String, String, String, Long, String)] = {
    val sep = body.indexOf("\r\n\r\n")
    if (sep < 0) return None
    val (wtype, url, rid, date, ctype, clen) =
      parseHeaders(body.substring(0, sep))
    if (clen < 0) return None
    val rest = body.substring(sep + 4)
    val restBytes = rest.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    if (restBytes.length < clen) return None // truncated record
    val payload = new String(restBytes, 0, clen.toInt,
      java.nio.charset.StandardCharsets.UTF_8)
    Some((wtype, url, rid, date, ctype, clen, payload))
  }

  /** The splittable WET reader (see object doc). Records that fail to
    * parse are dropped silently ONLY for the empty leading fragment;
    * anything else malformed lands in the `_corrupt` count a caller
    * can audit via the `is_valid` flag before `.where(col("is_valid"))`
    * — mirrors loadCsvQuarantine's honest-ingest contract. */
  def readWet(spark: SparkSession, path: String): DataFrame =
    parseRecords(spark.read.option("lineSep", RecordHeader + "\r\n")
      .text(path))

  /** STREAMING WET ingest: the same splittable record split + parse
    * over Structured Streaming's file source — new shards landing in
    * `path` become micro-batches (the crawl-drop shape), ready to
    * feed `Curate.streamingGate`/`streamingTail`. Batch ≡ streamed by
    * construction (shared parse; WarcSpec pins it). */
  def streamWet(spark: SparkSession, path: String): DataFrame =
    parseRecords(spark.readStream
      .option("lineSep", RecordHeader + "\r\n").text(path))

  private def parseRecords(lines: DataFrame): DataFrame = {
    val spark = lines.sparkSession
    import spark.implicits._
    lines.as[String]
      .flatMap { body =>
        if (body.trim.isEmpty) None // leading fragment before 1st record
        else parseRecordBody(body) match {
          case Some((url, rid, date, ctype, clen, payload)) =>
            Some((url, rid, date, ctype, clen, payload, true))
          case None => Some(("", "", "", "", -1L, body.take(64), false))
        }
      }
      .toDF("url", "record_id", "warc_date", "content_type",
        "content_length", "payload", "is_valid")
  }

  /** [[parseWarcBytesTyped]] minus the WARC-Type column — the WET
    * readers' historical shape. */
  private[sources] def parseWarcBytes(data: Array[Byte]):
      (Vector[(String, String, String, String, Long, String)], Long) = {
    val (recs, bad) = parseWarcBytesTyped(data)
    (recs.map { case (_, url, rid, date, ctype, clen, payload) =>
      (url, rid, date, ctype, clen, payload)
    }, bad)
  }

  /** Strict byte-arithmetic parse of a whole WARC/WET file: walk
    * records by Content-Length (never delimiter search), tolerate
    * CRLF or bare-LF header endings, require each record to start
    * with the version line. Returns parsed records (WARC-Type first)
    * + the count of bytes it could not account for (0 for a
    * well-formed file). */
  private[sources] def parseWarcBytesTyped(data: Array[Byte]):
      (Vector[(String, String, String, String, String, Long, String)], Long) = {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val out = Vector.newBuilder[(String, String, String, String, String, Long, String)]
    var bad = 0L
    var i = 0
    def startsWith(s: String, at: Int): Boolean = {
      val b = s.getBytes(utf8)
      at + b.length <= data.length &&
        java.util.Arrays.equals(
          java.util.Arrays.copyOfRange(data, at, at + b.length), b)
    }
    while (i < data.length) {
      // skip inter-record blank lines
      while (i < data.length && (data(i) == '\r' || data(i) == '\n')) i += 1
      if (i >= data.length) ()
      else if (!startsWith(RecordHeader, i)) { bad += data.length - i; i = data.length }
      else {
        // find the header/payload separator (blank line) — CRLF CRLF
        // per the spec, with bare-LF and MIXED endings tolerated (real
        // crawls mix them, including a LF-terminated last header line
        // followed by a CRLF blank: `...\n\r\n`). The scan looks for
        // any line break (`\r\n` or `\n`) immediately followed by
        // another, so all four combinations (4, 3, 3, 2 bytes) parse;
        // parseHeaders splits on either ending too.
        def breakLen(at: Int): Int =
          if (at < data.length && data(at) == '\r' &&
              at + 1 < data.length && data(at + 1) == '\n') 2
          else if (at < data.length && data(at) == '\n') 1
          else 0
        var hEnd = -1; var sepLen = 0; var ambiguous = false; var j = i
        while (hEnd < 0 && j < data.length) {
          val b1 = breakLen(j)
          if (b1 > 0) {
            val b2 = breakLen(j + b1)
            if (b2 > 0) {
              hEnd = j; sepLen = b1 + b2
              // `\n\r\n\r\n` — EITHER an LF-terminated LAST header
              // line followed by a SPEC CRLF-CRLF blank (separator is
              // all 5 bytes) OR an LF header + CRLF blank with a
              // payload that legitimately STARTS with CRLF (separator
              // is 3). The bytes alone cannot say; Content-Length
              // can: below, once clen is parsed, the window whose end
              // lands on a valid record boundary wins (ties go to the
              // spec-leaning 5-byte read). Spec-pure CRLF files never
              // enter this arm — their first break is 2 bytes.
              if (b1 == 1 && b2 == 2 && breakLen(j + 3) == 2)
                ambiguous = true
            }
          }
          j += 1
        }
        if (hEnd < 0) { bad += data.length - i; i = data.length }
        else {
          val headerText = new String(data, i, hEnd - i, utf8)
          val (wtype, url, rid, date, ctype, clen) =
            parseHeaders(headerText.stripPrefix(RecordHeader + "\r\n")
              .stripPrefix(RecordHeader + "\n"))
          if (ambiguous && clen >= 0) {
            // a valid boundary = only inter-record breaks up to EOF
            // or the next version line
            def boundaryOk(end: Long): Boolean =
              end <= data.length && {
                var p = end.toInt
                while (p < data.length &&
                  (data(p) == '\r' || data(p) == '\n')) p += 1
                p >= data.length || startsWith(RecordHeader, p)
              }
            sepLen =
              if (boundaryOk(hEnd + 5 + clen)) 5
              else if (boundaryOk(hEnd + 3 + clen)) 3
              else 5 // neither aligns: keep the spec-leaning read
          }
          if (clen >= 0 && hEnd + sepLen + clen <= data.length) {
            val payload = new String(data, hEnd + sepLen, clen.toInt, utf8)
            out += ((wtype, url, rid, date, ctype, clen, payload))
            i = hEnd + sepLen + clen.toInt
          } else { bad += data.length - i; i = data.length }
        }
      }
    }
    (out.result(), bad)
  }

  /** Transparent gzip: crawls ship `.warc.gz`/`.wet.gz` with ONE GZIP
    * MEMBER PER RECORD (that is what makes the format seekable via
    * an external index); `GZIPInputStream` reads concatenated members
    * as one stream, so the whole file inflates to the plain WARC byte
    * walk. Detection is by content (magic 1f 8b), not extension. */
  private[sources] def gunzipAll(data: Array[Byte]): Array[Byte] = {
    if (data == null || data.length < 2 ||
        (data(0) & 0xFF) != 0x1F || (data(1) & 0xFF) != 0x8B) return data
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(data), 64 * 1024)
    val out = new java.io.ByteArrayOutputStream(data.length * 4)
    val buf = new Array[Byte](64 * 1024)
    try {
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    } finally in.close()
    out.toByteArray
  }

  /** The strict per-file reader (see object doc): one `binaryFile`
    * row per shard, gzip inflated transparently (multi-member, the
    * crawl layout), exact byte walk, loud failure on unaccounted
    * bytes. Payloads never shuffle — the parse is one map stage. */
  def readWarcFiles(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (file, bytes) =>
        val (recs, bad) = parseWarcBytes(gunzipAll(bytes))
        require(bad == 0L,
          s"readWarcFiles: $bad unparseable bytes in $file")
        recs
      }
      .toDF("url", "record_id", "warc_date", "content_type",
        "content_length", "payload")
  }

  /** QUARANTINE variant of [[readWarcFiles]]: instead of failing the
    * whole job on one unparseable byte (at crawl scale one corrupt
    * shard must not abort a full ingest), every parsed record lands
    * with `is_valid` true and its source `file`/`bad_bytes` count,
    * and a file with unaccounted bytes ALSO emits one accounting row
    * (`is_valid` false, empty payload) — so corruption is countable,
    * alertable, and replayable, mirroring [[readWet]]'s and
    * `loadCsvQuarantine`'s honest-ingest contract. Filter
    * `.where(col("is_valid"))` for the strict-clean view. */
  def readWarcFilesQuarantine(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (file, bytes) =>
        val (recs, bad) = parseWarcBytes(gunzipAll(bytes))
        val parsed = recs.map { case (url, rid, date, ctype, clen, payload) =>
          (file, url, rid, date, ctype, clen, payload, bad, true)
        }
        if (bad == 0L) parsed
        else parsed :+ ((file, "", "", "", "", -1L, "", bad, false))
      }
      .toDF("file", "url", "record_id", "warc_date", "content_type",
        "content_length", "payload", "bad_bytes", "is_valid")
  }

  // ---------------------------------------------------------------
  // Raw WARC `response` records — CommonCrawl's actual crawl output
  // (the upstream of the derived WET): each record's payload is a
  // full HTTP message (status line, HTTP headers, body). The readers
  // below dispatch on WARC-Type and split the message, so pointing
  // the engine at real `.warc.gz` yields status/content-type columns
  // and the bare body instead of HTTP headers embedded in `payload`.
  // ---------------------------------------------------------------

  /** Split one HTTP message: (status code, Content-Type header value,
    * body). Status line must be `HTTP/x.y NNN ...`; header lines
    * tolerate CRLF or bare LF; a `Transfer-Encoding: chunked` body is
    * de-chunked ([[dechunk]] — malformed chunking falls back to the
    * raw body rather than inventing bytes). None when the payload is
    * not an HTTP message. */
  private[sources] def parseHttpMessage(payload: String):
      Option[(Int, String, String)] = {
    val (sep, sepLen) = {
      val a = payload.indexOf("\r\n\r\n")
      val b = payload.indexOf("\n\n")
      if (a >= 0 && (b < 0 || a < b)) (a, 4)
      else if (b >= 0) (b, 2) else (-1, 0)
    }
    if (sep < 0) return None
    val lines = payload.substring(0, sep).split("\r\n|\n")
    val StatusLine = "^HTTP/\\d\\.\\d +(\\d{3})(?: .*)?$".r
    lines.headOption.flatMap {
      case StatusLine(code) =>
        var ctype = ""; var chunked = false
        lines.iterator.drop(1).foreach { line =>
          val k = line.indexOf(':')
          if (k > 0) {
            val key = line.substring(0, k).trim.toLowerCase
            val v = line.substring(k + 1).trim
            if (key == "content-type") ctype = v
            else if (key == "transfer-encoding" &&
              v.toLowerCase.contains("chunked")) chunked = true
          }
        }
        val raw = payload.substring(sep + sepLen)
        val body = if (chunked) dechunk(raw).getOrElse(raw) else raw
        Some((code.toInt, ctype, body))
      case _ => None
    }
  }

  /** Decode a chunked transfer-encoded body: `<hex-size>[;ext]` line,
    * that many OCTETS of data (byte arithmetic — chunk sizes count
    * UTF-8 bytes, not chars), terminating CRLF, repeated until the
    * zero-size chunk (trailers ignored). None on malformed framing. */
  private[sources] def dechunk(raw: String): Option[String] = {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val bytes = raw.getBytes(utf8)
    val out = new java.io.ByteArrayOutputStream(bytes.length)
    var i = 0
    while (true) {
      var nl = i
      while (nl < bytes.length && bytes(nl) != '\n') nl += 1
      if (nl >= bytes.length) return None
      val line = new String(bytes, i, nl - i, utf8).stripSuffix("\r")
      val semi = line.indexOf(';')
      val hexs = (if (semi >= 0) line.substring(0, semi) else line).trim
      val size =
        try Integer.parseInt(hexs, 16)
        catch { case _: NumberFormatException => return None }
      i = nl + 1
      if (size == 0) return Some(new String(out.toByteArray, utf8))
      if (size < 0 || i + size > bytes.length) return None
      out.write(bytes, i, size)
      i += size
      if (i < bytes.length && bytes(i) == '\r') i += 1
      if (i < bytes.length && bytes(i) == '\n') i += 1
    }
    None
  }

  /** TYPED whole-container read — the raw-WARC entry point: every
    * record with its `warc_type`, and for `response` records the HTTP
    * message split into `http_status` / `http_content_type` / bare
    * body (chunked transfer de-chunked). Non-response records
    * (request, warcinfo, metadata, conversion, ...) keep their raw
    * payload with null HTTP columns — honest accounting: a caller
    * filtering to responses can count exactly what it skipped. A
    * response whose payload is NOT a parseable HTTP message also
    * keeps its raw payload with a null status (countable, never
    * silently dropped). Strict byte walk per file ([[readWarcFiles]]
    * semantics — gzip members inflate transparently, loud failure on
    * unaccounted bytes); one map stage, payloads never shuffle. */
  def readWarcRecords(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (file, bytes) =>
        val (recs, bad) = parseWarcBytesTyped(gunzipAll(bytes))
        require(bad == 0L,
          s"readWarcRecords: $bad unparseable bytes in $file")
        recs.map { case (wtype, url, rid, date, ctype, clen, payload) =>
          val http =
            if (wtype.equalsIgnoreCase("response")) parseHttpMessage(payload)
            else None
          http match {
            case Some((st, hct, body)) =>
              (url, rid, date, wtype, ctype, clen, Some(st),
                Some(hct), body)
            case None =>
              (url, rid, date, wtype, ctype, clen,
                None: Option[Int], None: Option[String], payload)
          }
        }
      }
      .toDF("url", "record_id", "warc_date", "warc_type", "content_type",
        "content_length", "http_status", "http_content_type", "payload")
  }

  /** The `response` records of a raw WARC with their HTTP message
    * parsed — [[readWarcRecords]] filtered to rows that earned an
    * `http_status` (`payload` is the bare body, ready for
    * `Web.htmlToText`). Pair with a count on the full
    * [[readWarcRecords]] frame to account for skipped record types. */
  def readWarcResponses(spark: SparkSession, path: String): DataFrame =
    readWarcRecords(spark, path)
      .where(lower(col("warc_type")) === "response" &&
        col("http_status").isNotNull)

  /** The shared typed-record parse behind the DELIMITER-split raw-
    * WARC readers (batch splittable + streaming): record body →
    * WARC-Type + headers + Content-Length byte cut, then the HTTP
    * message split for `response` records ([[parseHttpMessage]] —
    * an unparseable response keeps its raw payload with a null
    * status). [[readWet]]'s honest-ingest contract: fragments the
    * delimiter split broke land as `is_valid` false rows. */
  private def parseRecordsTyped(lines: DataFrame): DataFrame = {
    val spark = lines.sparkSession
    import spark.implicits._
    lines.as[String]
      .flatMap { body =>
        if (body.trim.isEmpty) None // leading fragment before 1st record
        else parseRecordBodyTyped(body) match {
          case Some((wtype, url, rid, date, ctype, clen, payload)) =>
            val http =
              if (wtype.equalsIgnoreCase("response")) parseHttpMessage(payload)
              else None
            http match {
              case Some((st, hct, b)) =>
                Some((url, rid, date, wtype, ctype, clen,
                  Some(st), Some(hct), b, true))
              case None =>
                Some((url, rid, date, wtype, ctype, clen,
                  None: Option[Int], None: Option[String], payload, true))
            }
          case None =>
            Some(("", "", "", "", "", -1L, None: Option[Int],
              None: Option[String], body.take(64), false))
        }
      }
      .toDF("url", "record_id", "warc_date", "warc_type", "content_type",
        "content_length", "http_status", "http_content_type", "payload",
        "is_valid")
  }

  /** SPLITTABLE raw-WARC reader — [[readWet]]'s delimiter split with
    * [[readWarcRecords]]'s typed schema (+`is_valid`): record
    * boundaries inside ONE uncompressed shard are assigned to many
    * tasks, the TB-scale layout. Same structural caveat as every
    * delimiter-split reader (a payload embedding the record header
    * splits wrong — FLAGGED via is_valid, never silent); the strict
    * byte walk ([[readWarcRecords]]) is immune and is the `.warc.gz`
    * path (gzip members are not splittable anyway). */
  def readWarcDelimited(spark: SparkSession, path: String): DataFrame =
    parseRecordsTyped(spark.read
      .option("lineSep", RecordHeader + "\r\n").text(path))

  /** STREAMING raw-WARC ingest: [[readWarcDelimited]]'s split+parse
    * over Structured Streaming's file source — new crawl shards
    * landing in `path` become micro-batches of typed response rows,
    * ready for `Curate.streamingGate`/`streamingTail` after a
    * `.where(col("is_valid") && col("http_status").isNotNull)`.
    * Batch ≡ streamed by construction (shared parse; WarcSpec pins
    * it). */
  def streamWarcRecords(spark: SparkSession, path: String): DataFrame =
    parseRecordsTyped(spark.readStream
      .option("lineSep", RecordHeader + "\r\n").text(path))

  /** Low-level raw-WARC writer: one record per row from explicit
    * (warc_type, content_type, payload) columns — the fixture/sink
    * side of [[readWarcRecords]], sharing [[writeWet]]'s contract
    * (deterministic md5 record ids, octet-exact Content-Length, text
    * sink with CRLF terminator, every part independently parseable). */
  def writeWarc(df: DataFrame, typeCol: String, urlCol: String,
                ctypeCol: String, payloadCol: String, path: String,
                warcDate: String = "2026-01-01T00:00:00Z",
                overwrite: Boolean = true): Unit = {
    val rec = concat(
      lit(RecordHeader), lit("\r\n"),
      lit("WARC-Type: "), col(typeCol), lit("\r\n"),
      lit("WARC-Target-URI: "), col(urlCol), lit("\r\n"),
      lit("WARC-Date: "), lit(warcDate), lit("\r\n"),
      lit("WARC-Record-ID: <urn:md5:"), md5(col(urlCol).cast("binary")),
      lit(">\r\n"),
      lit("Content-Type: "), col(ctypeCol), lit("\r\n"),
      lit("Content-Length: "),
      octet_length(col(payloadCol)).cast("string"), lit("\r\n"),
      lit("\r\n"),
      col(payloadCol), lit("\r\n"))
    val guarded = when(col(urlCol).isNull.or(col(payloadCol).isNull)
        .or(col(typeCol).isNull).or(col(ctypeCol).isNull),
      raise_error(concat(lit("writeWarc: null field, url="),
        coalesce(col(urlCol), lit("NULL"))))).otherwise(rec)
    df.select(guarded.as("value"))
      .write.mode(if (overwrite) "overwrite" else "errorifexists")
      .option("lineSep", "\r\n").text(path)
  }

  /** The HTTP message Column a `response` record carries: status line
    * (reason fixed to "OK" — parsers read only the code) +
    * Content-Type/Content-Length headers + blank line + body, CRLF
    * throughout; octet-exact lengths. Pure Catalyst string algebra so
    * an oracle replays it verbatim. */
  def httpResponseMessage(statusCol: org.apache.spark.sql.Column,
                          ctypeCol: org.apache.spark.sql.Column,
                          bodyCol: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    concat(
      lit("HTTP/1.1 "), statusCol.cast("string"), lit(" OK\r\n"),
      lit("Content-Type: "), ctypeCol, lit("\r\n"),
      lit("Content-Length: "), octet_length(bodyCol).cast("string"),
      lit("\r\n\r\n"), bodyCol)

  /** Raw WARC `response` fixture/sink writer: wraps each row's body
    * in an [[httpResponseMessage]] and writes `response` records via
    * [[writeWarc]] (record Content-Length covers the WHOLE HTTP
    * message, as in real crawl output). */
  def writeWarcResponses(df: DataFrame, urlCol: String, statusCol: String,
                         ctypeCol: String, bodyCol: String, path: String,
                         warcDate: String = "2026-01-01T00:00:00Z",
                         overwrite: Boolean = true): Unit =
    writeWarc(
      df.select(col(urlCol),
        lit("response").as("__wt"),
        lit("application/http;msgtype=response").as("__ct"),
        httpResponseMessage(col(statusCol), col(ctypeCol), col(bodyCol))
          .as("__msg")),
      "__wt", urlCol, "__ct", "__msg", path, warcDate, overwrite)
}
