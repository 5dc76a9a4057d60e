package graft.sources

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Randomized coverage of the pure WARC parse kernels — the byte walk
  * and the record-body cut run once per record at crawl scale, so
  * their invariants get property coverage beyond WarcSpec's
  * hand-picked shapes. No SparkSession. */
object WarcProps extends Properties("warc") {

  // payloads deliberately include CRLF, blank lines, unicode, and the
  // record header itself — everything a delimiter-naive parser breaks on
  private val payload: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumStr.map(_.take(12)),
    Gen.const("\r\n"), Gen.const("\r\n\r\n"),
    Gen.const("☃ ünïcode"), Gen.const("WARC/1.0\r\n")))
    .map(_.mkString(" "))

  private val url: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(s => "https://p.example/" + s.mkString)

  private def record(u: String, p: String): String = {
    val len = p.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
    s"WARC/1.0\r\nWARC-Target-URI: $u\r\nContent-Length: $len\r\n\r\n$p\r\n\r\n"
  }

  property("parseWarcBytes: mux -> walk recovers every record exactly") =
    forAll(Gen.listOf(Gen.zip(url, payload))) { recs =>
      val bytes = recs.map { case (u, p) => record(u, p) }.mkString
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val (out, bad) = Warc.parseWarcBytes(bytes)
      Prop(bad == 0L) &&
        Prop(out.map(r => (r._1, r._6)) == recs.toVector)
    }

  property("parseRecordBody: Content-Length cuts payloads byte-exactly") =
    forAll(url, payload) { (u, p) =>
      val body = record(u, p).stripPrefix("WARC/1.0\r\n")
      Warc.parseRecordBody(body)
        .map { case (pu, _, _, _, len, pp) => (pu, len, pp) }
        .contains((u,
          p.getBytes(java.nio.charset.StandardCharsets.UTF_8).length.toLong,
          p))
    }

  property("parseRecordBody: truncated payload rejects, never short-reads") =
    forAll(url, payload.suchThat(_.nonEmpty)) { (u, p) =>
      val full = record(u, p).stripPrefix("WARC/1.0\r\n")
      // claim more bytes than exist after the blank line
      val inflated = full.replaceFirst("Content-Length: \\d+",
        "Content-Length: " +
          (p.getBytes(java.nio.charset.StandardCharsets.UTF_8).length + 9999))
      Warc.parseRecordBody(inflated).isEmpty
    }

  property("parseHttpMessage: response mux -> parse round-trips exactly") =
    forAll(Gen.choose(100, 599), Gen.alphaNumStr.map("text/" + _), payload) {
      (status, ctype, body) =>
        val msg = s"HTTP/1.1 $status OK\r\nContent-Type: $ctype\r\n" +
          s"Content-Length: ${body.getBytes("UTF-8").length}\r\n\r\n$body"
        Warc.parseHttpMessage(msg).contains((status, ctype, body))
    }

  property("dechunk: octet-exact chunk reassembly, multibyte safe") =
    forAll(payload, Gen.choose(1, 7)) { (body, nChunks) =>
      // split the body into char-chunks; each chunk's hex size counts
      // its UTF-8 OCTETS (the framing real servers emit)
      val step = math.max(1, body.length / nChunks)
      val chunks = body.grouped(step).toList
      val framed = chunks.map { c =>
        val n = c.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
        f"$n%x\r\n$c\r\n"
      }.mkString + "0\r\n\r\n"
      Warc.dechunk(framed).contains(body)
    }

  property("response records: mux -> typed walk -> HTTP split round-trips") =
    forAll(Gen.listOf(Gen.zip(url, Gen.choose(100, 599), payload))) { recs =>
      val bytes = recs.map { case (u, status, body) =>
        val msg = s"HTTP/1.1 $status OK\r\nContent-Type: text/html\r\n" +
          s"Content-Length: ${body.getBytes("UTF-8").length}\r\n\r\n$body"
        val len = msg.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
        s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $u\r\n" +
          s"Content-Length: $len\r\n\r\n$msg\r\n\r\n"
      }.mkString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val (out, bad) = Warc.parseWarcBytesTyped(bytes)
      Prop(bad == 0L) && Prop(out.map { r =>
        (r._2, Warc.parseHttpMessage(r._7))
      } == recs.map { case (u, st, b) => (u, Some((st, "text/html", b))) }
        .toVector)
    }

  property("gunzipAll: member-per-record concatenation inflates whole") =
    forAll(Gen.nonEmptyListOf(payload)) { ps =>
      val members = ps.map { p =>
        val bo = new java.io.ByteArrayOutputStream()
        val gz = new java.util.zip.GZIPOutputStream(bo)
        gz.write(p.getBytes("UTF-8")); gz.close()
        bo.toByteArray
      }
      val whole = members.reduce(_ ++ _)
      new String(Warc.gunzipAll(whole), "UTF-8") == ps.mkString
    }
}
