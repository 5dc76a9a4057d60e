package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Video payloads: a REAL RIFF/AVI container path — pure JVM, no codec
 * dependency, the video counterpart of [[Multimodal.decodePpm]] (P6)
 * and [[Multimodal.decodeWav]] (RIFF/WAVE). Extension surface (no
 * reference counterpart).
 *
 * Two frame codecs, both decoded FOR REAL:
 *  - `00db` uncompressed DIB frames (BI_RGB 24-bit, bottom-up BGR
 *    rows padded to 4 bytes — the standard raw-video AVI layout).
 *    Lossless, so q178 proves the whole chain (mux → chunk walk →
 *    frame slice → row flip/unpad → luminance) against an arithmetic
 *    DuckDB oracle.
 *  - `00dc` Motion-JPEG frames ('MJPG' handler): each frame is a
 *    complete JPEG payload decoded via [[Multimodal.decodeRaster]]
 *    (the JDK's `javax.imageio`).
 *
 * Scale notes: payloads are heavy and never shuffle — the frame index
 * and the frame features are each ONE map stage over the blob table;
 * downstream joins carry (blob_id, frame_idx) plus narrow features.
 * The parse is a bounded chunk walk (strict sizes, like decodeWav),
 * and per-frame pixel allocation is capped by the same
 * header-dims-before-decode guard the raster path uses.
 */
object Video {

  /** One frame's location inside the payload: absolute byte offset of
    * the frame data, its length, and whether it is codec-compressed
    * (`00dc`) or a raw DIB (`00db`). */
  final case class AviFrame(offset: Long, length: Int, compressed: Boolean)

  /** Parsed container metadata: stream dimensions (from the
    * BITMAPINFOHEADER), frame timing (from avih), and the REAL frame
    * index recovered from the movi chunk walk. */
  final case class AviInfo(width: Int, height: Int, usPerFrame: Int,
                           frames: Vector[AviFrame]) {
    def nFrames: Int = frames.length
    def durationMs: Long = frames.length.toLong * usPerFrame / 1000
  }

  private def le32(d: Array[Byte], i: Int): Int =
    (d(i) & 0xFF) | ((d(i + 1) & 0xFF) << 8) |
      ((d(i + 2) & 0xFF) << 16) | ((d(i + 3) & 0xFF) << 24)

  private def tagAt(d: Array[Byte], i: Int): String =
    new String(d, i, 4, "US-ASCII")

  /** DIB row stride: rows pad to 4-byte boundaries. */
  private def dibStride(w: Int): Int = (w * 3 + 3) & ~3

  // ---------------------------------------------------------------
  // Muxer — used by fixtures/tests and the re-encode side of frame
  // surgery. Emits the canonical minimal layout: RIFF('AVI '
  // LIST('hdrl' avih LIST('strl' strh strf)) LIST('movi' frames)).
  // ---------------------------------------------------------------

  /** Mux raw RGB frames (each `w*h*3` packed triplets) into an AVI.
    * `mjpeg = false` writes standard uncompressed bottom-up BGR DIB
    * `00db` frames ('DIB ' handler, BI_RGB); `mjpeg = true` encodes
    * each frame as JPEG ([[Multimodal.encodeJpeg]], pinned quality)
    * into `00dc` frames ('MJPG' handler). */
  def encodeAvi(w: Int, h: Int, fps: Int, rgbFrames: Seq[Array[Byte]],
                mjpeg: Boolean = false): Array[Byte] = {
    require(w > 0 && h > 0 && fps > 0, s"bad avi geometry ${w}x$h@$fps")
    rgbFrames.foreach(f => require(f.length == w * h * 3,
      s"frame is ${f.length} bytes, expected ${w * h * 3} for ${w}x$h"))
    val payloads: Seq[Array[Byte]] =
      if (mjpeg) rgbFrames.map(Multimodal.encodeJpeg(w, h, _))
      else rgbFrames.map { rgb =>
        val stride = dibStride(w)
        val out = new Array[Byte](stride * h)
        var y = 0
        while (y < h) {
          val srcRow = (h - 1 - y) * w * 3 // bottom-up
          var x = 0
          while (x < w) {
            out(y * stride + 3 * x) = rgb(srcRow + 3 * x + 2)     // B
            out(y * stride + 3 * x + 1) = rgb(srcRow + 3 * x + 1) // G
            out(y * stride + 3 * x + 2) = rgb(srcRow + 3 * x)     // R
            x += 1
          }
          y += 1
        }
        out
      }
    writeAvi(w, h, 1000000 / fps, payloads, mjpeg)
  }

  /** The one container writer behind [[encodeAvi]] and frame surgery:
    * canonical minimal layout — RIFF('AVI ' LIST('hdrl' avih
    * LIST('strl' strh strf)) LIST('movi' frames)). `payloads` are
    * already codec-encoded frame bytes (raw padded DIB or JPEG). */
  private def writeAvi(w: Int, h: Int, usPerFrame: Int,
                       payloads: Seq[Array[Byte]], mjpeg: Boolean): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    def w32(v: Int): Unit = {
      buf.write(v & 0xFF); buf.write((v >> 8) & 0xFF)
      buf.write((v >> 16) & 0xFF); buf.write((v >> 24) & 0xFF)
    }
    def w16(v: Int): Unit = { buf.write(v & 0xFF); buf.write((v >> 8) & 0xFF) }
    def tag(s: String): Unit = buf.write(s.getBytes("US-ASCII"), 0, 4)
    val maxFrame = if (payloads.isEmpty) 0 else payloads.map(_.length).max
    val strlSize = 4 + (8 + 56) + (8 + 40) // 'strl' + strh + strf
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize) // 'hdrl' + avih + LIST strl
    val moviSize = 4 + payloads.map(p => 8 + p.length + (p.length & 1)).sum
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)

    tag("RIFF"); w32(riffSize); tag("AVI ")
    tag("LIST"); w32(hdrlSize); tag("hdrl")
    tag("avih"); w32(56)
    w32(usPerFrame); w32(0); w32(0); w32(0) // usPerFrame, maxBps, pad, flags
    w32(payloads.length); w32(0); w32(1); w32(maxFrame) // frames, initial, streams, bufSize
    w32(w); w32(h); w32(0); w32(0); w32(0); w32(0) // dims + reserved[4]
    tag("LIST"); w32(strlSize); tag("strl")
    tag("strh"); w32(56)
    tag("vids"); if (mjpeg) tag("MJPG") else tag("DIB ")
    w32(0); w16(0); w16(0); w32(0) // flags, prio, lang, initialFrames
    w32(usPerFrame); w32(1000000); w32(0); w32(payloads.length) // scale, rate, start, length
    w32(maxFrame); w32(-1); w32(0) // bufSize, quality, sampleSize
    w16(0); w16(0); w16(w); w16(h) // rcFrame
    tag("strf"); w32(40)
    w32(40); w32(w); w32(h); w16(1); w16(24)
    if (mjpeg) tag("MJPG") else w32(0)
    w32(dibStride(w) * h); w32(0); w32(0); w32(0); w32(0)
    tag("LIST"); w32(moviSize); tag("movi")
    payloads.foreach { p =>
      tag(if (mjpeg) "00dc" else "00db"); w32(p.length)
      buf.write(p, 0, p.length)
      if ((p.length & 1) == 1) buf.write(0) // word alignment
    }
    buf.toByteArray
  }

  // ---------------------------------------------------------------
  // Demuxer
  // ---------------------------------------------------------------

  /** Cheap container sniff, the [[Multimodal.looksLikeRaster]]
    * analogue: RIFF magic with the 'AVI ' form type. A WAV payload
    * (RIFF + 'WAVE') never enters this path. */
  private[ops] def looksLikeAvi(d: Array[Byte]): Boolean =
    d != null && d.length >= 24 &&
      d(0) == 'R' && d(1) == 'I' && d(2) == 'F' && d(3) == 'F' &&
      d(8) == 'A' && d(9) == 'V' && d(10) == 'I' && d(11) == ' '

  /** REAL AVI parse: strict-bounds chunk walk (the decodeWav
    * discipline — any size escaping the payload rejects), recovers
    * dimensions/timing from hdrl and the frame index from movi.
    * Returns None for anything malformed; those payloads fall back
    * to the stub metadata synthesis, exactly like non-P6 images. */
  private[ops] def parseAvi(data: Array[Byte]): Option[AviInfo] = {
    if (!looksLikeAvi(data)) return None
    val riffSize = le32(data, 4)
    if (riffSize < 4 || 8L + riffSize > data.length) return None
    val end = 8 + riffSize
    var w = -1; var h = -1; var usPerFrame = -1
    val frames = Vector.newBuilder[AviFrame]

    // walk one LIST body [from, to); depth-bounded recursion (AVI
    // nests hdrl/strl/movi only — anything deeper is malformed)
    def walk(from: Int, to: Int, depth: Int): Boolean = {
      if (depth > 4) return false
      var i = from
      while (i + 8 <= to) {
        val t = tagAt(data, i)
        val size = le32(data, i + 4)
        if (size < 0 || i + 8 + size > to) return false
        if (t == "LIST") {
          if (size < 4) return false
          val listType = tagAt(data, i + 8)
          if (listType == "hdrl" || listType == "strl" ||
              listType == "movi" || listType == "rec ") {
            if (!walk(i + 12, i + 8 + size, depth + 1)) return false
          } // unknown LISTs skip silently (odml etc.)
        } else if (t == "avih") {
          if (size < 40) return false
          usPerFrame = le32(data, i + 8)
          w = le32(data, i + 8 + 32); h = le32(data, i + 8 + 36)
        } else if (t.length == 4 && t(0).isDigit && t(1).isDigit &&
                   (t.substring(2) == "db" || t.substring(2) == "dc")) {
          frames += AviFrame(i + 8L, size, compressed = t.endsWith("dc"))
        } // idx1/strh/strf/JUNK: skip (dims come from avih; strf
          // bitcount is validated at frame-decode time by length)
        i += 8 + size + (size & 1) // word-aligned chunks
      }
      true
    }
    if (!walk(12, end, 0)) return None
    val fs = frames.result()
    if (w <= 0 || h <= 0 || usPerFrame <= 0 || fs.isEmpty ||
        w.toLong * h > 64L * 1024 * 1024) None
    else Some(AviInfo(w, h, usPerFrame, fs))
  }

  /** Decode one frame to packed RGB triplets. Raw `00db` frames
    * un-pad + flip the bottom-up BGR rows (losslessly — the q178
    * oracle replays this arithmetic); `00dc` frames go through the
    * JDK raster decode (MJPEG = one JPEG per frame). */
  private[ops] def decodeFrame(data: Array[Byte], info: AviInfo,
                               idx: Int): Option[(Int, Int, Array[Byte])] = {
    if (idx < 0 || idx >= info.frames.length) return None
    val f = info.frames(idx)
    val off = f.offset.toInt
    if (f.compressed) {
      Multimodal.decodeRaster(
        java.util.Arrays.copyOfRange(data, off, off + f.length))
    } else {
      val w = info.width; val h = info.height
      val stride = dibStride(w)
      if (f.length != stride * h) return None
      val rgb = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        val src = off + (h - 1 - y) * stride
        var x = 0
        while (x < w) {
          rgb(3 * (y * w + x)) = data(src + 3 * x + 2)     // R
          rgb(3 * (y * w + x) + 1) = data(src + 3 * x + 1) // G
          rgb(3 * (y * w + x) + 2) = data(src + 3 * x)     // B
          x += 1
        }
        y += 1
      }
      Some((w, h, rgb))
    }
  }

  // ---------------------------------------------------------------
  // Spark operators — payload stays in ONE map stage, never shuffles.
  // ---------------------------------------------------------------

  /** REAL frame index for AVI payloads: every `stride`-th frame's
    * actual byte offset + length from the container chunk walk (the
    * upgrade of [[Multimodal.sampleFrames]]'s even-split stub).
    * Non-AVI payloads emit no rows — an honest index, not synthesis.
    * One narrow map stage; emits (blob_id, frame_idx, byte_offset,
    * frame_bytes, is_compressed). */
  def frameIndex(blobs: DataFrame, stride: Int): DataFrame = {
    require(stride >= 1, s"frame stride must be >= 1, got $stride")
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("blob_id"), col("data"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, data) =>
        parseAvi(data).toSeq.flatMap { info =>
          (0 until info.nFrames by stride).map { i =>
            val f = info.frames(i)
            (id, i, f.offset, f.length, f.compressed)
          }
        }
      }
      .toDF("blob_id", "frame_idx", "byte_offset", "frame_bytes",
        "is_compressed")
  }

  /** Keep every `stride`-th frame, re-muxed into a new AVI — the
    * video analogue of [[Multimodal.decimateAudio]]. Frame PAYLOADS
    * are copied as opaque byte slices (no pixel decode, no
    * re-encode — a raw frame stays raw, an MJPEG frame stays the
    * same JPEG bytes), the effective frame rate divides by `stride`
    * so duration is preserved. Non-AVI payloads pass through
    * untouched. One map stage. */
  def decimateFrames(blobs: DataFrame, stride: Int): DataFrame = {
    require(stride >= 1, s"frame stride must be >= 1, got $stride")
    val dec = udf((data: Array[Byte]) =>
      parseAvi(data) match {
        case Some(info) if stride > 1 =>
          val kept = (0 until info.nFrames by stride).map(info.frames)
          remux(data, info, kept, info.usPerFrame * stride)
        case _ => data
      })
    blobs.withColumn("data", dec(col("data")))
  }

  /** Rebuild an AVI from frame slices of an existing payload (same
    * dims/codec, new timing) — the shared tail of frame surgery. */
  private def remux(data: Array[Byte], info: AviInfo,
                    kept: Seq[AviFrame], usPerFrame: Int): Array[Byte] =
    writeAvi(info.width, info.height, usPerFrame,
      kept.map(f => java.util.Arrays.copyOfRange(
        data, f.offset.toInt, f.offset.toInt + f.length)),
      mjpeg = kept.nonEmpty && kept.head.compressed)

  /** Per-frame PERCEPTUAL hashes at a fixed stride — the video member
    * of the perceptual family: decode every `stride`-th frame for
    * real (DIB un-pad/flip or MJPEG via the JDK raster path) and
    * dHash it with the SAME kernel the still-image path uses
    * ([[Multimodal.dhash64]]), so a frame extracted from a video and
    * the same image stored standalone hash identically. One map
    * stage, payloads never shuffle; undecodable frames and non-AVI
    * payloads emit no rows (honest — surface them via
    * [[frameIndex]]). Output: (idCol, frame_idx, dhash). */
  def framePerceptualHash(blobs: DataFrame, stride: Int,
                          idCol: String = "blob_id",
                          dataCol: String = "data"): DataFrame = {
    require(stride >= 1, s"frame stride must be >= 1, got $stride")
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col(idCol), col(dataCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, data) =>
        parseAvi(data).toSeq.flatMap { info =>
          (0 until info.nFrames by stride).flatMap { i =>
            decodeFrame(data, info, i).map { case (w, h, rgb) =>
              (id, i, Multimodal.dhash64(w, h, rgb))
            }
          }
        }
      }
      .toDF(idCol, "frame_idx", "dhash")
  }

  /** VIDEO near-duplicate pairs — completes the perceptual modality
    * set (text SimHash, embedding cosine, image dHash, audio
    * envelope, video frame-dHash): two videos pair when EVERY sampled
    * frame position matches within `maxHamming` (or, with
    * `minMatchFrac < 1`, when at least that fraction of the larger
    * side's sampled positions match). Frame hashes ride the shared
    * banded 16-bit-chunk Hamming join KEYED BY FRAME POSITION — a
    * frame can only witness a pair at its own sampled index, so the
    * candidate space is (position, chunk, key) buckets, never
    * all-pairs, and per-frame recall is EXACT for maxHamming <= 3 by
    * pigeonhole (the SimHash guarantee). Catches re-encoded
    * (DIB ↔ MJPEG) and grid-aligned rescaled copies that byte-level
    * dedup misses; videos with different sampled-frame counts can
    * only pair under a fractional `minMatchFrac` (matched positions
    * are measured against the LARGER side).
    *
    * Scale shape: one decode map stage (payloads never shuffle), a
    * (pos, chunk, key)-bucketed candidate join over narrow 64-bit
    * rows, then a per-pair count aggregate against the per-video
    * frame censuses. Output: (id_a, id_b, matched_frames, n_frames),
    * id-normalized. */
  def videoNearDupPairs(blobs: DataFrame, stride: Int,
                        maxHamming: Int = 2, minMatchFrac: Double = 1.0,
                        idCol: String = "blob_id",
                        dataCol: String = "data"): DataFrame = {
    require(maxHamming >= 0, "maxHamming must be >= 0")
    require(minMatchFrac > 0.0 && minMatchFrac <= 1.0,
      "minMatchFrac must be in (0, 1]")
    val sigs = framePerceptualHash(blobs, stride, idCol, dataCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val counts = sigs.groupBy(col(idCol))
        .agg(count(lit(1)).as("__n"))
      val chunked = sigs.select(col(idCol), col("frame_idx"), col("dhash"),
        posexplode(SimHash.chunkKeys(col("dhash")))
          .as(Seq("__chunk", "__key")))
      val a = chunked.select(col("frame_idx"), col("__chunk"), col("__key"),
        col(idCol).as("id_a"), col("dhash").as("sig_a"))
      val b = chunked.select(col("frame_idx"), col("__chunk"), col("__key"),
        col(idCol).as("id_b"), col("dhash").as("sig_b"))
      val matched = a.join(b, Seq("frame_idx", "__chunk", "__key"))
        .where(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), col("frame_idx"),
          col("sig_a"), col("sig_b"))
        .dropDuplicates("id_a", "id_b", "frame_idx")
        .where(SimHash.hamming(col("sig_a"), col("sig_b")) <= maxHamming)
        .groupBy(col("id_a"), col("id_b"))
        .agg(count(lit(1)).as("matched_frames"))
      val out = matched
        .join(counts.select(col(idCol).as("id_a"), col("__n").as("__na")),
          Seq("id_a"))
        .join(counts.select(col(idCol).as("id_b"), col("__n").as("__nb")),
          Seq("id_b"))
        .withColumn("n_frames", greatest(col("__na"), col("__nb")))
        .where(col("matched_frames") >=
          ceil(lit(minMatchFrac) * col("n_frames")))
        .select(col("id_a"), col("id_b"), col("matched_frames"),
          col("n_frames"))
        .localCheckpoint(true)
      out
    } finally { sigs.unpersist(); () }
  }

  /** Decode every `stride`-th frame and emit its REAL luminance
    * histogram (the [[Multimodal.luminanceHistogram]] kernel, shared
    * with the still-image path) plus decoded dimensions. One map
    * stage; frames that fail to decode are dropped (honest, like the
    * audio path's nulls). */
  def frameFeatures(blobs: DataFrame, stride: Int, bins: Int = 16): DataFrame = {
    require(stride >= 1, s"frame stride must be >= 1, got $stride")
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("blob_id"), col("data"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, data) =>
        parseAvi(data).toSeq.flatMap { info =>
          (0 until info.nFrames by stride).flatMap { i =>
            decodeFrame(data, info, i).map { case (w, h, rgb) =>
              (id, i, w, h, Multimodal.luminanceHistogram(rgb, bins))
            }
          }
        }
      }
      .toDF("blob_id", "frame_idx", "width", "height", "features")
  }
}
