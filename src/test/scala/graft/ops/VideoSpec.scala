package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** The AVI container path: REAL mux/demux (strict chunk walk), REAL
  * raw-DIB and MJPEG frame decode, real frame index — plus the blob
  * ingest upgrade (real n_frames/duration for video payloads). */
class VideoSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private def frame(seed: Int, w: Int = 5, h: Int = 4): Array[Byte] =
    Array.tabulate(w * h * 3)(i => ((seed * 31 + i * 7) % 256).toByte)

  test("AVI mux/demux round-trip: header, frame index, lossless DIB decode") {
    val frames = (0 until 3).map(frame(_))
    val avi = Video.encodeAvi(5, 4, fps = 10, frames)
    val Some(info) = Video.parseAvi(avi)
    assert(info.width === 5 && info.height === 4)
    assert(info.usPerFrame === 100000 && info.durationMs === 300)
    assert(info.nFrames === 3)
    assert(info.frames.forall(!_.compressed))
    // offsets are REAL positions: strictly increasing, inside payload,
    // and each frame is the padded-stride DIB size (5*3 -> stride 16)
    assert(info.frames.map(_.offset) === info.frames.map(_.offset).sorted)
    assert(info.frames.forall(f => f.offset + f.length <= avi.length))
    assert(info.frames.forall(_.length === 16 * 4))
    // decode is LOSSLESS through padding + bottom-up flip + BGR swap
    for (i <- 0 until 3) {
      val Some((w, h, rgb)) = Video.decodeFrame(avi, info, i)
      assert((w, h) === (5, 4))
      assert(rgb.toSeq === frames(i).toSeq, s"frame $i")
    }
    assert(Video.decodeFrame(avi, info, 3) === None) // out of range
  }

  test("MJPEG AVI: compressed frames at real offsets decode via the JDK codec") {
    val f0 = Array.tabulate(11 * 7 * 3)(i => ((i / 3) % 11 * 16 + 40).toByte)
    val f1 = Array.tabulate(11 * 7 * 3)(i => ((i / 3) / 11 * 20 + 60).toByte)
    val avi = Video.encodeAvi(11, 7, fps = 5, Seq(f0, f1), mjpeg = true)
    val Some(info) = Video.parseAvi(avi)
    assert(info.nFrames === 2 && info.frames.forall(_.compressed))
    // the recorded offset really points at JPEG bytes
    val off = info.frames(1).offset.toInt
    assert((avi(off) & 0xFF) === 0xFF && (avi(off + 1) & 0xFF) === 0xD8)
    val Some((w, h, rgb)) = Video.decodeFrame(avi, info, 1)
    assert((w, h) === (11, 7)) // dims exact through the lossy codec
    val maxErr = rgb.indices.map(i =>
      math.abs((rgb(i) & 0xFF) - (f1(i) & 0xFF))).max
    assert(maxErr <= 12, s"mjpeg frame error $maxErr")
  }

  test("parse is strict: WAV, truncation, size escapes, garbage all reject") {
    val wav = Multimodal.encodeWav(
      Multimodal.PcmAudio(8000, 1, Array[Short](1, 2, 3)))
    assert(Video.parseAvi(wav) === None) // RIFF but 'WAVE'
    val avi = Video.encodeAvi(5, 4, fps = 10, Seq(frame(1)))
    assert(Video.parseAvi(avi.dropRight(1)) === None) // truncated
    assert(Video.parseAvi("RIFFxxxxAVI but not really".getBytes) === None)
    assert(Video.parseAvi(null) === None)
    // corrupt a chunk size so it escapes the payload -> reject
    val corrupt = avi.clone()
    corrupt(16) = 0x7F // avih size high byte
    assert(Video.parseAvi(corrupt) === None)
  }

  test("frameIndex: real offsets, stride semantics, no shuffle, honest non-AVI") {
    val avi = Video.encodeAvi(5, 4, fps = 10, (0 until 5).map(frame(_)))
    val Some(info) = Video.parseAvi(avi)
    val blobs = Seq((1L, avi), (2L, "not a video".getBytes))
      .toDF("blob_id", "data")
    val idx = Video.frameIndex(blobs, stride = 2)
    val rows = idx.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2))).sorted
    assert(rows.map(_._2).toSeq === Seq(0, 2, 4)) // stride picks 0,2,4
    assert(rows.forall(_._1 === 1L)) // non-AVI blob 2 emits NO rows
    assert(rows.map(_._3).toSeq ===
      Seq(0, 2, 4).map(i => info.frames(i).offset))
    val plan = idx.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(1500))
  }

  test("frameFeatures: shared luminance kernel on decoded frames") {
    // two frames: all-black and half-white/half-black (by rows)
    val black = Array.fill(4 * 4 * 3)(0.toByte)
    val half = Array.tabulate(4 * 4 * 3)(i =>
      if (i / 3 < 8) 255.toByte else 0.toByte)
    val avi = Video.encodeAvi(4, 4, fps = 2, Seq(black, half))
    val blobs = Seq((7L, avi)).toDF("blob_id", "data")
    val rows = Video.frameFeatures(blobs, stride = 1, bins = 16)
      .orderBy("frame_idx").collect()
    assert(rows.length === 2)
    assert(rows(0).getInt(2) === 4 && rows(0).getInt(3) === 4)
    assert(rows(0).getSeq[Float](4)(0) === 1.0f) // all pixels in bin 0
    val f1 = rows(1).getSeq[Float](4)
    assert(f1(0) === 0.5f && f1(15) === 0.5f)
  }

  test("decimateFrames: opaque-slice remux keeps every k-th frame bit-exact") {
    val frames = (0 until 5).map(frame(_))
    val avi = Video.encodeAvi(5, 4, fps = 10, frames)
    val blobs = Seq((1L, avi), (2L, "not a video".getBytes))
      .toDF("blob_id", "data")
    val out = Video.decimateFrames(blobs, stride = 2)
      .orderBy("blob_id").collect()
    val Some(info) = Video.parseAvi(out(0).getAs[Array[Byte]]("data"))
    assert(info.nFrames === 3) // frames 0, 2, 4
    assert(info.usPerFrame === 200000) // rate divides, duration holds
    assert(info.durationMs === 600)
    for ((orig, i) <- Seq(0, 2, 4).zipWithIndex) {
      val Some((_, _, rgb)) =
        Video.decodeFrame(out(0).getAs[Array[Byte]]("data"), info, i)
      assert(rgb.toSeq === frames(orig).toSeq, s"kept frame $i")
    }
    // MJPEG frames survive as the SAME bytes (no re-encode generation loss)
    val mj = Video.encodeAvi(11, 7, fps = 4,
      (0 until 4).map(frame(_, 11, 7)), mjpeg = true)
    val Some(mjInfo) = Video.parseAvi(mj)
    val mjOut = Video.decimateFrames(Seq((1L, mj)).toDF("blob_id", "data"), 3)
      .collect()(0).getAs[Array[Byte]]("data")
    val Some(mjOutInfo) = Video.parseAvi(mjOut)
    assert(mjOutInfo.nFrames === 2 && mjOutInfo.frames.forall(_.compressed))
    val f0 = mjInfo.frames(0)
    val slice = java.util.Arrays.copyOfRange(mj,
      f0.offset.toInt, f0.offset.toInt + f0.length)
    val g0 = mjOutInfo.frames(0)
    assert(java.util.Arrays.copyOfRange(mjOut,
      g0.offset.toInt, g0.offset.toInt + g0.length).toSeq === slice.toSeq)
    // stride 1 is identity; opaque payloads pass through
    assert(out(1).getAs[Array[Byte]]("data").toSeq ===
      "not a video".getBytes.toSeq)
    assert(Video.decimateFrames(blobs.where(col("blob_id") === 1), 1)
      .collect()(0).getAs[Array[Byte]]("data").toSeq === avi.toSeq)
  }

  test("blob ingest reports REAL video metadata; stubs only for opaque") {
    val avi = Video.encodeAvi(5, 4, fps = 10, (0 until 4).map(frame(_)))
    val raw = Seq(
      (1L, avi),
      (2L, Multimodal.encodePng(8, 4, frame(3, 8, 4))),
      (3L, "opaque bytes that decode as nothing".getBytes))
      .toDF("id", "payload")
    val meta = Multimodal.asBlobTable(raw, "id", "payload", "mixed")
      .select("blob_id", "meta.width", "meta.height", "meta.n_frames",
        "meta.duration_ms")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4))).toMap
    assert(meta(1L) === ((5, 4, 4, 400L)))   // REAL avih metadata
    assert(meta(2L)._1 === 8 && meta(2L)._2 === 4) // REAL PNG header dims
    assert(meta(3L)._1 >= 1 && meta(3L)._1 <= 1920) // stub synthesis
  }

  test("videoNearDupPairs: rescaled/re-encoded copies pair, equals brute force") {
    val w = 36; val h = 24
    def px(k: Int, f: Int): Array[Byte] = {
      val a = new Array[Byte](w * h * 3)
      for (y <- 0 until h; x <- 0 until w) {
        val i = 3 * (y * w + x)
        a(i) = ((k * 5 + f * 17 + x * 3 + y * 7) % 256).toByte
        a(i + 1) = ((k * 11 + f * 3 + x * 5) % 256).toByte
        a(i + 2) = ((k * 7 + f * 13 + y * 11) % 256).toByte
      }
      a
    }
    def up2(rgb: Array[Byte]): Array[Byte] =
      Multimodal.nnResizeRgb(w, h, rgb, 2 * w, 2 * h)
    val base = (0 until 6).map(px(0, _))
    val vids = Seq(
      (1L, Video.encodeAvi(w, h, 10, base)),                    // original
      (2L, Video.encodeAvi(2 * w, 2 * h, 10, base.map(up2))),   // 2x rescale
      (3L, Video.encodeAvi(w, h, 10, base, mjpeg = true)),      // re-encode
      (4L, Video.encodeAvi(w, h, 10, (0 until 6).map(px(9, _)))), // different
      (5L, "not a video at all".getBytes("UTF-8")),             // opaque
      (6L, Video.encodeAvi(w, h, 10, base.take(4))))            // short copy
      .toDF("blob_id", "data")
    def pairs(maxH: Int, frac: Double) =
      Video.videoNearDupPairs(vids, stride = 2, maxHamming = maxH,
        minMatchFrac = frac)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val strict = pairs(3, 1.0)
    // the grid-aligned 2x rescale hashes BIT-EXACT equal (dhash
    // area-pools integer cells), and the MJPEG re-encode sits within
    // the Hamming budget on every sampled frame
    assert(strict.contains((1L, 2L)), s"rescaled copy missed: $strict")
    assert(strict.contains((1L, 3L)) && strict.contains((2L, 3L)),
      s"re-encoded copy missed: $strict")
    assert(!strict.exists(p => p._1 == 4L || p._2 == 4L)) // different content
    assert(!strict.exists(p => p._1 == 5L || p._2 == 5L)) // opaque: no rows
    // the short copy shares only 2 of the larger side's 3 sampled
    // positions: dropped at frac 1.0, admitted at 0.6
    assert(!strict.exists(p => p._1 == 6L || p._2 == 6L))
    val loose = pairs(3, 0.6)
    assert(loose.contains((1L, 6L)) && loose.contains((2L, 6L)))
    // banded join == brute force over the same frame hashes (the
    // q193 discipline: bucketing must never lose a pair)
    val sigs = Video.framePerceptualHash(vids, stride = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).map { case (id, rs) =>
        id -> rs.map(t => t._2 -> t._3).toMap }
    val ids = sigs.keys.toSeq.sorted
    val brute = (for {
      i <- ids; j <- ids if i < j
      na = sigs(i).size; nb = sigs(j).size
      m = sigs(i).keySet.intersect(sigs(j).keySet).count(p =>
        java.lang.Long.bitCount(sigs(i)(p) ^ sigs(j)(p)) <= 3)
      if m >= math.ceil(1.0 * math.max(na, nb)).toInt
    } yield (i, j)).toSet
    assert(strict === brute)
  }
}
